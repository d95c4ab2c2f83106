"""Multi-host (DCN) init smoke test: two local processes coordinate through
``jax.distributed`` / ``initialize_multihost`` and run one ``psum`` over the
global 2-process CPU mesh.

This is the only test that exercises ``detax.dist.mesh.initialize_multihost``
(everything else runs single-process on the 8-virtual-device mesh). Marked
``multihost``: it spawns subprocesses and takes ~1 min on a cold cache.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 device per process
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from detax.dist.mesh import initialize_multihost

initialize_multihost(
    coordinator_address={coord!r},
    num_processes=2,
    process_id=int(sys.argv[1]),
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()  # global view over DCN

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 1), axis_names=("data", "spatial"))
pid = jax.process_index()

# each process contributes its rank+1; psum over the data axis must see both
local = jnp.full((1, 4), float(pid + 1))
arr = jax.make_array_from_process_local_data(NamedSharding(mesh, P("data")), np.asarray(local))

@jax.jit
def total(x):
    return jnp.sum(x)

t = float(total(arr))
assert abs(t - 12.0) == 0.0, t  # (1+2) * 4 elements
print(f"proc {{pid}} ok total={{t}}")
"""


_CKPT_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 device per process
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from detax.dist.mesh import initialize_multihost

initialize_multihost(
    coordinator_address={coord!r},
    num_processes=2,
    process_id=int(sys.argv[1]),
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from detax.train.checkpoint import CheckpointManager
from detax.train.train_state import create_train_state

mesh = Mesh(np.asarray(jax.devices()).reshape(2), axis_names=("data",))
sh = NamedSharding(mesh, P("data"))
pid = jax.process_index()

# a deterministic cross-process-sharded param tree: each process owns one
# row-shard of w; b is replicated
local_w = (np.arange(8, dtype=np.float32) + 10 * pid).reshape(1, 8)
w = jax.make_array_from_process_local_data(sh, local_w)
b = jax.make_array_from_process_local_data(NamedSharding(mesh, P()), np.full((3,), 7.0, np.float32))
params = {{"dense": {{"w": w, "b": b}}}}
import dataclasses
state, _ = create_train_state(params, rng=jax.random.PRNGKey(0))
state = dataclasses.replace(state, step=jnp.asarray(5, jnp.int32))

mgr = CheckpointManager({ckdir!r})
mgr.save(state, is_best=True, wait=True)

# restore into a zero template with the SAME shardings (the multi-host
# restore path must land each process's shard back on its own devices)
zeros = jax.tree_util.tree_map(lambda x: jnp.zeros_like(x), state)
restored = mgr.restore(zeros)
step_val = int(np.asarray(restored.step.addressable_shards[0].data))
assert step_val == 5, step_val
got = np.asarray(restored.params["dense"]["w"].addressable_shards[0].data)
np.testing.assert_array_equal(got, local_w)
np.testing.assert_array_equal(
    np.asarray(restored.params["dense"]["b"].addressable_shards[0].data), np.full((3,), 7.0)
)
# optimizer state round-trips too (momentum buffers share the param tree)
leaves_a = jax.tree_util.tree_leaves(state.opt_state)
leaves_b = jax.tree_util.tree_leaves(restored.opt_state)
assert len(leaves_a) == len(leaves_b) and len(leaves_a) > 0
restored_best = mgr.restore_best(zeros)
np.testing.assert_array_equal(
    np.asarray(restored_best.params["dense"]["w"].addressable_shards[0].data), local_w
)
mgr.close()
print(f"proc {{pid}} ckpt ok")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.multihost
def test_two_process_distributed_init(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    code = _WORKER.format(repo=repo, coord=coord)
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} ok" in out


@pytest.mark.multihost
def test_two_process_checkpoint_roundtrip(tmp_path):
    """Orbax save/restore from 2 coordinated processes: cross-process-sharded
    params + opt state + step land back on each process's own shard (backs
    the 'async multi-host capable' claim in detax/train/checkpoint.py)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    ckdir = str(tmp_path / "ckpt")
    code = _CKPT_WORKER.format(repo=repo, coord=coord, ckdir=ckdir)
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_")}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code, str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} ckpt ok" in out
