"""Settings tier: TOML file + env override (reference dynaconf analog,
``/root/reference/settings.toml:1-5`` + ``.env:1-3``)."""

import os

from detax import settings


def test_defaults_without_file(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("DETAX_SETTINGS", raising=False)
    monkeypatch.delenv("DETAX_CKP_DIR", raising=False)
    settings.reload()
    assert settings.get("ckp_dir").endswith("workspace/checkpoint")
    assert settings.get("data_dir").endswith("workspace/data")
    assert settings.get("nope", "fallback") == "fallback"


def test_toml_file_and_env_override(tmp_path, monkeypatch):
    cfg = tmp_path / "detax-settings.toml"
    cfg.write_text(
        "[default]\nckp_dir = '/ckpt/from/file'\ndata_dir = '/data/from/file'\n"
    )
    monkeypatch.setenv("DETAX_SETTINGS", str(cfg))
    monkeypatch.setenv("DETAX_DATA_DIR", "/data/from/env")
    settings.reload()
    try:
        # file layer
        assert settings.get("ckp_dir") == "/ckpt/from/file"
        # env layer wins over the file (the .env analog)
        assert settings.get("data_dir") == "/data/from/env"
        # untouched keys keep defaults
        assert settings.get("run_dir").endswith("workspace/run")
    finally:
        settings.reload()
