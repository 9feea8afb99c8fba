"""2-process jax.distributed CPU test (VERDICT item 7).

Spawns two real processes that connect over a localhost coordinator, build one
global mesh spanning both processes' devices, assemble a global batch from
process-local rows (parallel/mesh.py shard_batch), and run a psum-style global
reduction — the multi-host half of SURVEY.md §2.8's TPU-native plan, exercised
without TPUs.  Each child also checks process_shard disjoint coverage.
"""

import socket
import subprocess
import sys
import textwrap

import pytest

CHILD = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")   # before backend init (sitecustomize
                                                # forces axon,cpu and ignores env)
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    from buctd_tpu.parallel import initialize_distributed, process_shard
    from buctd_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    assert initialize_distributed(f"localhost:{port}", nproc, pid) is True
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid
    # second call is a no-op (already initialized)
    assert initialize_distributed() is True

    # process_shard: disjoint cover of the index space
    sl = process_shard(10)
    assert sl == (slice(0, 5) if pid == 0 else slice(5, 10)), sl

    import numpy as np
    import jax.numpy as jnp
    mesh = make_mesh()                     # all global devices on the data axis
    n_global = jax.device_count()
    assert n_global == nproc * jax.local_device_count()

    # global batch 2*n_global rows; this process contributes its local half,
    # with a process-dependent value so the reduction proves cross-host comms
    local = np.full((2 * jax.local_device_count(), 4), float(pid + 1), np.float32)
    batch = shard_batch({"x": local}, mesh)
    assert batch["x"].shape == (2 * n_global, 4)

    from jax.sharding import NamedSharding, PartitionSpec as P
    @jax.jit
    def global_sum(b):
        return jnp.sum(b["x"])             # XLA inserts the cross-host reduce

    got = float(global_sum(batch))
    want = sum(2 * jax.local_device_count() * 4 * (p + 1) for p in range(nproc))
    assert got == want, (got, want)

    # replicated tree placement works multi-host too
    rep = replicate({"w": np.arange(3, dtype=np.float32)}, mesh)
    assert float(jax.jit(lambda t: t["w"].sum())(rep)) == 3.0
    print(f"child {pid}: ok global_sum={got}")
""")


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    with socket.socket() as s:  # free port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo")
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid}: ok" in out
