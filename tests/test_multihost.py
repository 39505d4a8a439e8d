"""Real 2-process multi-host validation (SURVEY.md §3.4, §5.4).

Everything else in the suite simulates hosts with shims; this test actually
spawns two OS processes, wires them with ``jax.distributed`` over localhost
(the CPU backend's cross-process collectives), and runs one sharded EM
sweep with the triplet batch split between the processes.  Each process
asserts the psum'd result equals the full-data single-process reference.

Also guards the ``maybe_initialize`` regression where probing
``jax.process_count()`` initialized the XLA backend before
``jax.distributed.initialize`` could run.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
from trigenicinteractionpredictor_tpu.parallel.distributed import maybe_initialize

topo = maybe_initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)
assert topo.process_count == nproc, topo
assert topo.global_devices == 2 * nproc, topo

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from trigenicinteractionpredictor_tpu.data.synthetic import sample_synthetic_dataset
from trigenicinteractionpredictor_tpu.models.mmsbm import init_state
from trigenicinteractionpredictor_tpu.ops.em import Batch, em_step
from trigenicinteractionpredictor_tpu.parallel.mesh import DATA_AXIS, ENSEMBLE_AXIS
from trigenicinteractionpredictor_tpu.parallel.sharded_em import make_sharded_train_step

# Full dataset is derivable on every process (same seed); each process owns
# a contiguous row shard.
ds, _, _ = sample_synthetic_dataset(256, 16, 3, seed=0)
deg = jnp.asarray(ds.degrees())
n_dev = 2 * nproc
mesh = Mesh(np.asarray(jax.devices()).reshape(1, n_dev), (ENSEMBLE_AXIS, DATA_AXIS))

rows_per_proc = ds.n_rows // nproc
lo = pid * rows_per_proc
hi = lo + rows_per_proc
row_sh = NamedSharding(mesh, P(DATA_AXIS))
batch = Batch(
    triplets=jax.make_array_from_process_local_data(row_sh, ds.triplets[lo:hi]),
    ratings=jax.make_array_from_process_local_data(row_sh, ds.ratings[lo:hi]),
    weights=jax.make_array_from_process_local_data(row_sh, ds.weights[lo:hi]),
)
rep = NamedSharding(mesh, P())
S = 1
states = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(
    jax.random.split(jax.random.key(7), S)
)
states = jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P(ENSEMBLE_AXIS))), states)
deg_sh = jax.device_put(deg, rep)

step = make_sharded_train_step(mesh)
new_states, ll = step(states, batch, deg_sh)

# Single-process reference on the full data.
ref_states0 = jax.vmap(lambda k: init_state(k, ds.n_genes, 3, 2))(
    jax.random.split(jax.random.key(7), S)
)
full_batch = Batch(
    triplets=jnp.asarray(ds.triplets),
    ratings=jnp.asarray(ds.ratings),
    weights=jnp.asarray(ds.weights),
)
ref_states, ref_ll = jax.vmap(em_step, in_axes=(0, None, None))(
    ref_states0, full_batch, deg
)

# Multihost outputs: fetch the replicated/addressable values.
theta = np.asarray(jax.device_get(new_states.theta))
ll_np = np.asarray(jax.device_get(ll))
np.testing.assert_allclose(theta, np.asarray(ref_states.theta), atol=1e-5)
np.testing.assert_allclose(ll_np, np.asarray(ref_ll), rtol=1e-5)
print(f"MH-OK pid={pid}", flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_em(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "mh_worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = repo
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-3000:]
        assert "MH-OK" in out, out[-3000:]
