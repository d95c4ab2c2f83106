"""PyTorch→JAX weight import + activation parity (the reference's oracle
pattern, automated: SURVEY.md §4 / §3.5 weight lifecycle)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from detax.configs.resnet import ResNetConf
from detax.models.resnet import ResNet
from detax.train.torch_import import import_resnet, merge_pretrained
from tests.torch_ref import randomized_resnet18


@pytest.fixture(scope="module")
def torch_model():
    return randomized_resnet18(seed=0, num_classes=10)


def test_import_and_forward_parity(torch_model):
    """Imported weights must reproduce torch activations (frozen BN, eval)."""
    conf = ResNetConf(norm="frozen_bn", num_classes=10)
    model = ResNet(conf=conf)

    rng = np.random.RandomState(0)
    x = rng.randn(2, 64, 64, 3).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    imported = import_resnet(torch_model.state_dict(), norm="frozen_bn")
    variables = merge_pretrained(variables, imported)

    out = model.apply(variables, jnp.asarray(x))

    with torch.no_grad():
        tout = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    for name in ["res1", "res2", "res3", "res4"]:
        got = np.asarray(out[name])
        want = tout[name].numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(out["logits"]), tout["logits"].numpy(), rtol=1e-3, atol=1e-3
    )


def test_merge_rejects_shape_mismatch(torch_model):
    conf = ResNetConf(norm="frozen_bn", stage_channels=(32, 64, 128, 256))
    model = ResNet(conf=conf)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    imported = import_resnet(torch_model.state_dict(), norm="frozen_bn")
    with pytest.raises(AssertionError):
        merge_pretrained(variables, imported)


def test_import_covers_all_torch_weights(torch_model):
    """Every conv/bn/fc tensor in the torch model must land somewhere."""
    imported = import_resnet(torch_model.state_dict(), norm="frozen_bn")

    def count_leaves(tree):
        return len(jax.tree_util.tree_leaves(tree))

    n_imported = count_leaves(imported["params"])
    n_torch = len([k for k in torch_model.state_dict() if "num_batches_tracked" not in k])
    assert n_imported == n_torch
