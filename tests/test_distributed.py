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


CHILD_TRAIN = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ref1, ref2 = float(sys.argv[4]), float(sys.argv[5])

    from buctd_tpu.parallel import initialize_distributed, make_mesh
    assert initialize_distributed(f"localhost:{port}", nproc, pid) is True

    sys.path.insert(0, "/root/repo/tests")
    import disthelp
    # SGD: the update is LINEAR in the grads, so the second step's loss is a
    # faithful probe of gradient equivalence.  (Adam's first step is
    # ~ lr*sign(g); reduction-order noise flips signs of near-zero grads and
    # chaotically amplifies — observed 1.4% loss2 drift at perfect loss1.)
    cfg = disthelp.tiny_cfg(["TRAIN.OPTIMIZER", "sgd", "TRAIN.LR", "0.01"])
    batch = disthelp.global_batch(8)
    L = 8 // nproc                       # this process's rows of the global batch
    local = {k: v[pid * L:(pid + 1) * L] for k, v in batch.items()}
    mesh = make_mesh()                   # all global devices on the data axis
    l1, l2 = disthelp.two_step_losses(cfg, local, mesh)
    print(f"child {pid}: losses=({l1:.8f},{l2:.8f}) refs=({ref1:.8f},{ref2:.8f})",
          flush=True)
    # DataParallel semantics: the sharded 2-process run must reproduce the
    # single-process losses on the same global batch (grads psum'd over DCN)
    assert abs(l1 - ref1) <= 1e-5 + 1e-4 * abs(ref1), (l1, ref1)
    assert abs(l2 - ref2) <= 1e-5 + 1e-4 * abs(ref2), (l2, ref2)
    print(f"child {pid}: ok")
""")


@pytest.mark.slow
def test_two_process_train_step_equivalence(tmp_path):
    """A REAL sharded train step across 2 processes: two consecutive losses on
    the same global batch must match a single-process run (proves the grads are
    psum'd and applied identically — the actual multi-host correctness
    statement, VERDICT r2 item 1/3)."""
    import disthelp

    cfg = disthelp.tiny_cfg(["TRAIN.OPTIMIZER", "sgd", "TRAIN.LR", "0.01"])
    ref1, ref2 = disthelp.two_step_losses(cfg, disthelp.global_batch(8))
    print(f"parent refs=({ref1:.8f},{ref2:.8f})", flush=True)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    import os
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD_TRAIN, str(pid), "2", str(port),
             repr(ref1), repr(ref2)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid}: ok" in out


def test_loader_process_sharding(tmp_path, monkeypatch):
    """Loader multi-host semantics WITHOUT spawning processes: simulate 2
    processes via the _process_info seam and check (a) equal step counts, (b)
    per-batch local rows that concatenate to one global batch of DISTINCT
    samples, (c) disjoint full coverage of the db, (d) valid flags on padding."""
    from test_data_pipeline import _cfg, _tiny_coco

    ann_file, _ = _tiny_coco(tmp_path, n_imgs=3, people=2)   # 6 samples
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", ann_file])
    from buctd_tpu.data import get_dataset, pipeline
    from buctd_tpu.data.pipeline import Loader

    ds = get_dataset(cfg, is_train=False)
    assert len(ds) == 6

    per_proc = {}
    for pid in (0, 1):
        monkeypatch.setattr(pipeline, "_process_info", lambda p=pid: (p, 2))
        loader = Loader(ds, cfg, batch_size=4, num_workers=2)  # GLOBAL batch 4
        assert loader.batch == 2                                # local rows
        batches = list(loader)
        assert len(loader) == len(batches) == 2                 # ceil(3/2)
        per_proc[pid] = batches
    monkeypatch.setattr(pipeline, "_process_info", lambda: (0, 1))

    seen = []
    for step in range(2):
        ids = []
        for pid in (0, 1):
            b = per_proc[pid][step]
            valid = b["valid"].astype(bool)
            ids += list(b["annotation_id"][valid].astype(int))
        # each global step sees distinct samples across the two processes
        assert len(ids) == len(set(ids)), ids
        seen += ids
    # the epoch covers the whole db exactly once, disjointly
    assert sorted(seen) == sorted(int(r["annotation_id"]) for r in ds.db)
    # padding: process 1's last local batch has 1 valid row (shard len 3)
    assert per_proc[0][1]["valid"].tolist() == [1.0, 0.0]
    assert per_proc[1][1]["valid"].tolist() == [1.0, 0.0]


def test_loader_db_index_matches_order(tmp_path):
    """Every batch carries the global db row of each sample (db_index), and
    db[db_index].image == the batch's image_path row-for-row — including under
    a SHUFFLED order.  This is the invariant validate()'s multi-host merge
    rebuilds paths from (VERDICT r3 weak 4)."""
    from test_data_pipeline import _cfg, _tiny_coco

    ann_file, _ = _tiny_coco(tmp_path, n_imgs=3, people=2)   # 6 samples
    cfg = _cfg(["MODEL.CONDITIONAL_TOPDOWN", "True", "DATASET.COLORED", "True",
                "DATASET.SYNTHESIS_POSE", "False",
                "TEST.USE_BU_BBOX", "True", "TEST.USE_GT_BBOX", "False",
                "MODEL.IMAGE_SIZE", "[96, 128]", "MODEL.HEATMAP_SIZE", "[24, 32]",
                "DATASET.TEST_IMAGE_DIR", str(tmp_path),
                "DATASET.TEST_ANNOTATION_FILE", str(ann_file)])
    from buctd_tpu.data import get_dataset
    from buctd_tpu.data.pipeline import Loader

    ds = get_dataset(cfg, is_train=False)
    for shuffle in (False, True):
        loader = Loader(ds, cfg, batch_size=4, num_workers=2, shuffle=shuffle)
        seen = []
        for b in loader:
            valid = b["valid"].astype(bool)
            for j, path in zip(b["db_index"][valid],
                               [p for p, v in zip(b["image_path"], valid) if v]):
                assert ds.db[int(j)]["image"] == path, (j, path)
                seen.append(int(j))
        assert sorted(seen) == list(range(6))
        if shuffle:
            assert seen != list(range(6))   # the order genuinely moved


CHILD_PERSIST = textwrap.dedent("""
    import sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port, tmp = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                             sys.argv[4])

    from buctd_tpu.parallel import (initialize_distributed, is_primary,
                                    make_mesh, replicate, shard_batch)
    assert initialize_distributed(f"localhost:{port}", nproc, pid) is True
    assert is_primary() == (pid == 0)

    sys.path.insert(0, "/root/repo/tests")
    import disthelp
    cfg = disthelp.tiny_cfg(["OUTPUT_DIR", f"{tmp}/out", "LOG_DIR", f"{tmp}/log",
                             "TRAIN.OPTIMIZER", "sgd"])
    from buctd_tpu.utils import MetricWriter, create_logger
    logger, out_dir, tb_dir = create_logger(cfg, "persist.yaml", "train")
    writer = MetricWriter(tb_dir)
    writer.add_scalar("train_loss", 1.0)

    import jax.numpy as jnp
    from buctd_tpu.models import get_model
    from buctd_tpu.train.checkpoint import (restore_checkpoint, save_checkpoint,
                                            wait_for_saves)
    from buctd_tpu.train.state import create_train_state, make_train_step

    model = get_model(cfg, is_train=True)
    state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, 64, 3)), steps_per_epoch=1)
    batch = disthelp.global_batch(8)
    L = 8 // nproc
    local = {k: v[pid * L:(pid + 1) * L] for k, v in batch.items()}
    mesh = make_mesh()
    state = replicate(state, mesh)
    sb = shard_batch(local, mesh)
    step = make_train_step(cfg, model, mesh)
    # two epochs of the tools/train.py save cadence on a SHARED output tree:
    # process-0 gating means exactly one writer races nothing
    for epoch in range(2):
        state, metrics = step(state, sb, jax.random.PRNGKey(epoch))
        writer.add_scalar("train_loss", metrics["loss"])
        save_checkpoint(state, out_dir, is_best=(epoch == 0), perf=1.0,
                        block=False)
    save_checkpoint(state, out_dir, name="final_state", perf=1.0)
    wait_for_saves()
    writer.close()

    # all hosts resume from the shared tree (barrier first: proc 0 writes)
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("persist_saved")
    template = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)), steps_per_epoch=1)
    restored, found = restore_checkpoint(template, out_dir)
    assert found, "auto-resume found no checkpoint"
    assert int(restored.step) == 2, int(restored.step)
    print(f"child {pid}: ok persist out={out_dir}")
""")


@pytest.mark.slow
def test_two_process_train_persistence(tmp_path):
    """Two processes run two epochs of tools/train.py-equivalent code against
    ONE shared output tree: only process 0 may write checkpoints/logs/metrics,
    the tree must be clean (no orbax tmp leftovers, no duplicate files), and
    AUTO_RESUME-style restore must work on BOTH hosts (VERDICT r3 item 3)."""
    import os

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD_PERSIST, str(pid), "2", str(port),
             str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid}: ok persist" in out

    import glob
    root = str(tmp_path)
    # one clean checkpoint tree: the three expected saves, nothing else
    out_dirs = glob.glob(f"{root}/out/*/*/persist")
    assert len(out_dirs) == 1, out_dirs
    entries = sorted(os.listdir(out_dirs[0]))
    ckpts = [e for e in entries if not e.endswith(".log")]
    assert ckpts == ["checkpoint", "final_state", "model_best"], entries
    # no orbax in-progress/tmp leftovers anywhere
    assert not glob.glob(f"{root}/out/**/*tmp*", recursive=True)
    # exactly one process wrote a log file and one metrics.jsonl
    assert len(glob.glob(f"{root}/out/**/*.log", recursive=True)) == 1
    metrics = glob.glob(f"{root}/log/**/metrics.jsonl", recursive=True)
    assert len(metrics) == 1, metrics
    assert len(open(metrics[0]).readlines()) == 3


def test_allgather_rows_single_process():
    import numpy as np

    from buctd_tpu.parallel import allgather_rows, host_local_rows

    a = np.arange(12, dtype=np.float32).reshape(4, 3)
    assert np.array_equal(allgather_rows(a, 3, 4), a[:3])
    import jax.numpy as jnp
    assert np.array_equal(host_local_rows(jnp.asarray(a)), a)


def test_dcn_merge_rows_single_process():
    """The shared validate/λ-sweep merge helper: degenerate single-process
    path trims to the valid rows and keeps >2^24 annotation ids exact."""
    import numpy as np

    from buctd_tpu.parallel.mesh import dcn_merge_rows

    preds = np.arange(24, dtype=np.float32).reshape(4, 2, 3)
    boxes = np.random.default_rng(0).random((4, 8))
    boxes[:, 6] = [7, 2 ** 40 + 5, 16_777_217, 3]   # breaks a float32 ride
    db_idx = np.array([5, 9, 2, 0])
    pg, bg, dg, n = dcn_merge_rows(preds, boxes, db_idx, 3, 4, id_col=6)
    assert n == 3
    assert np.array_equal(pg, preds[:3])
    assert np.array_equal(dg, db_idx[:3])
    assert bg[:, 6].astype(np.int64).tolist() == [7, 2 ** 40 + 5, 16_777_217]
    np.testing.assert_allclose(
        bg[:, [0, 1, 2, 3, 4, 5, 7]],
        boxes[:3][:, [0, 1, 2, 3, 4, 5, 7]].astype(np.float32), rtol=0)


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


CHILD_VALIDATE = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    tmp, ann, ref_npz, ref_shuf_npz = (sys.argv[4], sys.argv[5], sys.argv[6],
                                       sys.argv[7])

    from buctd_tpu.parallel import initialize_distributed, make_mesh
    assert initialize_distributed(f"localhost:{port}", nproc, pid) is True

    sys.path.insert(0, "/root/repo/tests")
    import disthelp
    cfg = disthelp.eval_cfg(tmp, ann)
    mesh = make_mesh()
    for shuffle, npz in ((False, ref_npz), (True, ref_shuf_npz)):
        cap = disthelp.validate_capture(cfg, f"{tmp}/out", mesh=mesh,
                                        shuffle=shuffle)
        want = np.load(npz, allow_pickle=True)
        # every host ends with the full merged prediction set == the
        # single-process run — including under a SHUFFLED eval order (the
        # merge rebuilds paths from gathered db indices, not from an assumed
        # identity order)
        np.testing.assert_allclose(cap["preds"], want["preds"], atol=2e-3)
        np.testing.assert_allclose(cap["boxes"], want["boxes"], atol=2e-3)
        assert [str(p) for p in cap["paths"]] == [str(p) for p in want["paths"]]
    print(f"child {pid}: ok validate n={len(cap['paths'])}")
""")


CHILD_LAMBDA = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    tmp, ann, ref_npz = sys.argv[4], sys.argv[5], sys.argv[6]

    from buctd_tpu.parallel import initialize_distributed, make_mesh
    assert initialize_distributed(f"localhost:{port}", nproc, pid) is True

    sys.path.insert(0, "/root/repo/tests")
    import disthelp
    cfg = disthelp.eval_cfg(tmp, ann)
    cap = disthelp.lambda_canon(
        disthelp.lambda_capture(cfg, f"{tmp}/out", mesh=make_mesh()))

    want = np.load(ref_npz, allow_pickle=True)
    np.testing.assert_allclose(cap["preds"], want["preds"], atol=2e-3)
    np.testing.assert_allclose(cap["boxes"], want["boxes"], atol=2e-3)
    assert [str(p) for p in cap["paths"]] == [str(p) for p in want["paths"]]
    print(f"child {pid}: ok lambda n={len(cap['paths'])}")
""")


@pytest.mark.slow
def test_two_process_lambda_sweep_equivalence(tmp_path):
    """The λ-sweep eval across 2 real processes must reproduce the
    single-process merged (preds, boxes-with-λ, paths) set on every host
    (closes VERDICT r3 weak 5 — it used to raise NotImplementedError)."""
    import os

    import numpy as np

    import disthelp
    from test_data_pipeline import _tiny_coco

    ann_file, _ = _tiny_coco(tmp_path, n_imgs=3, people=2)   # 6 val samples
    cfg = disthelp.eval_cfg(tmp_path, ann_file)
    ref = disthelp.lambda_canon(disthelp.lambda_capture(cfg, tmp_path / "ref"))
    assert len(ref["paths"]) == 12                           # 6 samples x 2 λ
    assert ref["boxes"].shape[1] == 8                        # the λ column
    ref_npz = tmp_path / "ref.npz"
    np.savez(ref_npz, preds=ref["preds"], boxes=ref["boxes"],
             paths=np.array([str(p) for p in ref["paths"]]))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD_LAMBDA, str(pid), "2", str(port),
             str(tmp_path), str(ann_file), str(ref_npz)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid}: ok lambda n=12" in out


@pytest.mark.slow
def test_two_process_validate_equivalence(tmp_path):
    """validate() across 2 real processes: sharded loaders + the DCN
    all-gather merge must reproduce the single-process all_preds/all_boxes/
    image-path set ON EVERY HOST (closes VERDICT r2 missing #1's eval half —
    the np.asarray-on-global-array crash and the duplicated-batch bug are both
    caught by this shape of test)."""
    import os

    import numpy as np

    import disthelp
    from test_data_pipeline import _tiny_coco

    ann_file, _ = _tiny_coco(tmp_path, n_imgs=3, people=2)   # 6 val samples
    cfg = disthelp.eval_cfg(tmp_path, ann_file)
    ref = disthelp.validate_capture(cfg, tmp_path / "ref")
    assert len(ref["paths"]) == 6
    ref_npz = tmp_path / "ref.npz"
    np.savez(ref_npz, preds=ref["preds"], boxes=ref["boxes"],
             paths=np.array([str(p) for p in ref["paths"]]))
    # shuffled-eval reference: same seed everywhere -> same global order; a
    # shuffled loader must NOT corrupt the merged path list (VERDICT r3 weak 4)
    ref_s = disthelp.validate_capture(cfg, tmp_path / "ref_s", shuffle=True)
    assert [str(p) for p in ref_s["paths"]] != [str(p) for p in ref["paths"]]
    ref_shuf_npz = tmp_path / "ref_shuf.npz"
    np.savez(ref_shuf_npz, preds=ref_s["preds"], boxes=ref_s["boxes"],
             paths=np.array([str(p) for p in ref_s["paths"]]))

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    # 2 CPU devices per process -> a 4-device global mesh; the global eval
    # batch (4) must divide the mesh's data axis
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=2")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", CHILD_VALIDATE, str(pid), "2", str(port),
             str(tmp_path), str(ann_file), str(ref_npz), str(ref_shuf_npz)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo", env=env)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"child {pid} failed:\n{out}"
        assert f"child {pid}: ok validate n=6" in out
