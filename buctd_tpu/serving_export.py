"""Exported serving artifacts: the bucketed serving programs as StableHLO.

The reference has no deployment/export story — serving it means carrying the
whole repo + a .pth on PYTHONPATH and re-tracing the model per process
(tools/inference.py).  Torch-land's answer would be TorchScript/ONNX; the
TPU-native answer is the traced program itself.  ``jax.export`` serializes the
jitted crop->render->forward->decode(->refine) pipeline (core/refine.py) per
bucket shape; at load time the artifact deserializes and calls — **no model or
config code, no python re-tracing**, and together with the persistent
compilation cache (utils/compcache.py) the first call per machine is the only
compile ever paid.

Artifact layout (a directory):

    manifest.json                — format version, model/joint metadata,
                                   program keys, vis_thres-free call contract
    params.npz                   — flattened variables, ``::``-joined path keys
    prog_<h>x<w>x<p>.shlo        — single-image refine program
                                   (variables, (h,w,3) u8, (p,J,3) f32, (2,) f32)
    prog_<n>x<h>x<w>x<p>.shlo    — batched rows program (vmapped over n)

Weights travel as *arguments* (params.npz), not baked-in constants, so the
artifact stays small-ish, params remain inspectable/swappable, and the same
program can serve updated weights of identical structure.

Caveat: kernel-engine selection (TPU.ATTENTION_ENGINE / TPU.WARP_ENGINE
``auto``) happens at TRACE time from the *current* backend, so the traced
program embeds that choice — export for ``cpu`` from a CPU-backed process
and for ``tpu`` from a TPU-backed one (a pallas kernel traced under TPU has
no cpu lowering; export_estimator raises with this guidance).
"""

from __future__ import annotations

import json
import os

import numpy as np

from .serving import IMG_BUCKETS, POSE_BUCKETS, PoseEstimator, _bucket

FORMAT_VERSION = 1
_SEP = "::"   # flax layer names never contain '::' ('/' is not safe: npz paths)


# -- params (de)serialization ------------------------------------------------

def _flatten_params(variables) -> dict:
    """Nested dict pytree -> flat {'a::b::c': np.ndarray}."""
    out = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(prefix + [str(k)], v)
        else:
            out[_SEP.join(prefix)] = np.asarray(node)

    rec([], variables)
    return out


def _unflatten_params(flat: dict) -> dict:
    out: dict = {}
    for key, val in flat.items():
        node = out
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


def _plain_dict(variables):
    """Canonicalize to plain nested dicts so the exported pytree structure is
    exactly what ``_unflatten_params`` rebuilds at load time (FrozenDict and
    dict trace to different treedefs)."""
    if isinstance(variables, dict):
        return {k: _plain_dict(v) for k, v in variables.items()}
    if hasattr(variables, "items"):          # flax FrozenDict
        return {k: _plain_dict(v) for k, v in variables.items()}
    return variables


# -- export ------------------------------------------------------------------

def export_estimator(est: PoseEstimator, shapes, out_dir: str,
                     platforms=("cpu", "tpu"),
                     check_platform: bool = True) -> dict:
    """Serialize ``est``'s serving programs for the given bucket ``shapes``.

    shapes: iterable of (h, w, p) single-image keys and/or (n, h, w, p)
    batched keys — the same tuples ``PoseEstimator(precompile=...)`` takes.
    Returns the manifest dict.  Shapes are snapped to the bucket tables so the
    artifact's keys match what a live estimator would have compiled.

    Exports are single-device programs (data-parallel serving re-shards at the
    call site; a ``mesh=`` estimator exports the same per-device program).
    """
    import jax

    os.makedirs(out_dir, exist_ok=True)
    variables = _plain_dict(est.variables)
    J = est.num_joints

    single = jax.jit(lambda v, img, conds, wh:
                     est.refine(v, img, conds, img_wh=wh))
    batched = jax.jit(jax.vmap(
        lambda v, img, conds, wh: est.refine(v, img, conds, img_wh=wh),
        in_axes=(None, 0, 0, 0)))

    # non-canonical platform names (the axon TPU relay registers as 'axon')
    # can't appear in `platforms`; exporting the tpu lowering with the
    # platform check disabled lets the artifact run there anyway
    disabled = ([] if check_platform
                else [jax.export.DisabledSafetyCheck.platform()])

    def do_export(fn, *specs):
        try:
            return jax.export.export(fn, platforms=list(platforms),
                                     disabled_checks=disabled)(*specs)
        except ValueError as e:
            if "interpret mode" in str(e) or "pallas" in str(e).lower():
                raise ValueError(
                    "export hit a pallas kernel that can't lower for "
                    f"platforms={list(platforms)}: engine selection "
                    "(TPU.ATTENTION_ENGINE / TPU.WARP_ENGINE 'auto') is "
                    "decided at trace time by the CURRENT backend, not the "
                    "export target — export for 'cpu' from a CPU-backed "
                    "process (jax.config.update('jax_platforms', 'cpu')) "
                    "and for 'tpu' from a TPU-backed one") from e
            raise

    var_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        variables)

    def spec(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype)

    keys = []
    for key in shapes:
        key = tuple(int(v) for v in key)
        if len(key) == 3:
            h, w, p = key
            key = (_bucket(h, IMG_BUCKETS), _bucket(w, IMG_BUCKETS),
                   _bucket(p, POSE_BUCKETS))
            hb, wb, pb = key
            exp = do_export(
                single, var_specs, spec((hb, wb, 3), np.uint8),
                spec((pb, J, 3), np.float32), spec((2,), np.float32))
        else:
            n, h, w, p = key
            key = (n, _bucket(h, IMG_BUCKETS), _bucket(w, IMG_BUCKETS),
                   _bucket(p, POSE_BUCKETS))
            nb, hb, wb, pb = key
            exp = do_export(
                batched, var_specs, spec((nb, hb, wb, 3), np.uint8),
                spec((nb, pb, J, 3), np.float32), spec((nb, 2), np.float32))
        name = "prog_" + "x".join(str(v) for v in key) + ".shlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        if list(key) not in keys:
            keys.append(list(key))

    np.savez(os.path.join(out_dir, "params.npz"),
             **_flatten_params(variables))
    manifest = {
        "format_version": FORMAT_VERSION,
        "model_name": str(est.cfg.MODEL.NAME),
        "num_joints": J,
        "refine_iters": est.refine_iters,
        "platforms": list(platforms),
        "platform_check": bool(check_platform),
        "programs": keys,
        "jax_version": jax.__version__,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# -- load + serve ------------------------------------------------------------

class ExportedPoseEstimator:
    """Serve from an exported artifact directory — no model/config code.

    Mirrors ``PoseEstimator.predict`` / ``predict_many`` with the same
    bucketing and padding contract, but every program comes from
    ``jax.export.deserialize`` instead of tracing flax modules.  Only the
    bucket shapes present in the artifact exist; a call no exported bucket
    contains raises (the artifact is the compile contract, there is nothing
    to fall back to).
    """

    def __init__(self, path: str):
        import jax

        self.path = path
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        if self.manifest["format_version"] != FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.manifest['format_version']} != "
                f"supported {FORMAT_VERSION}")
        self.num_joints = int(self.manifest["num_joints"])
        with np.load(os.path.join(path, "params.npz")) as z:
            self.variables = _unflatten_params({k: z[k] for k in z.files})
        self._progs: dict = {}
        self._single = sorted(tuple(k) for k in self.manifest["programs"]
                              if len(k) == 3)
        self._batched = sorted(tuple(k) for k in self.manifest["programs"]
                               if len(k) == 4)
        self._jax = jax

    def _load(self, key):
        if key not in self._progs:
            name = "prog_" + "x".join(str(v) for v in key) + ".shlo"
            with open(os.path.join(self.path, name), "rb") as f:
                exp = self._jax.export.deserialize(bytearray(f.read()))
            self._progs[key] = self._jax.jit(exp.call)
        return self._progs[key]

    def _pick(self, hb, wb, pb):
        fits = sorted((k for k in self._single
                       if k[0] >= hb and k[1] >= wb and k[2] >= pb),
                      key=lambda k: (k[0] * k[1] * k[2], k))
        if not fits:
            raise RuntimeError(
                f"no exported program contains shape {(hb, wb, pb)}; artifact "
                f"has {self._single} — re-export with the shapes you serve")
        return fits[0]

    def predict(self, image, condition_poses, vis_thres: float = 0.0):
        """Same contract as PoseEstimator.predict (serving.py:179)."""
        image = np.asarray(image)
        if image.dtype != np.uint8:
            image = np.clip(image, 0, 255).astype(np.uint8)
        conds = np.asarray(condition_poses, np.float32)
        if conds.ndim == 2:
            conds = conds[None]
        if conds.shape[-1] == 2:
            conds = np.concatenate(
                [conds, np.ones((*conds.shape[:-1], 1), np.float32)], -1)
        P = conds.shape[0]
        hb, wb, pb = self._pick(_bucket(image.shape[0], IMG_BUCKETS),
                                _bucket(image.shape[1], IMG_BUCKETS),
                                _bucket(P, POSE_BUCKETS))
        img_pad = np.zeros((hb, wb, 3), np.uint8)
        img_pad[:image.shape[0], :image.shape[1]] = image
        if pb != P:
            conds = np.concatenate(
                [conds, np.repeat(conds[:1], pb - P, 0)])
        wh = np.asarray([image.shape[1], image.shape[0]], np.float32)
        preds, maxvals = self._load((hb, wb, pb))(
            self.variables, img_pad, conds, wh)
        out = np.concatenate([np.asarray(preds), np.asarray(maxvals)],
                             axis=2)[:P]
        out[out[:, :, 2] < vis_thres] = np.nan
        return out

    def predict_many(self, images, conditions, vis_thres: float = 0.0) -> list:
        return [self.predict(img, conds, vis_thres)
                for img, conds in zip(images, conditions)]

    def predict_batch(self, images, conditions,
                      vis_thres: float = 0.0) -> list:
        """Batch same-bucket images into exported (n, h, w, p) programs when
        the artifact has them; images with no matching batched program fall
        back to the per-image path (which raises only if no single-image
        program contains them either)."""
        pairs = []
        for im, cs in zip(images, conditions):
            im = np.asarray(im)
            if im.dtype != np.uint8:
                im = np.clip(im, 0, 255).astype(np.uint8)
            cs = np.asarray(cs, np.float32)
            if cs.ndim == 2:
                cs = cs[None]
            if cs.shape[-1] == 2:
                cs = np.concatenate(
                    [cs, np.ones((*cs.shape[:-1], 1), np.float32)], -1)
            pairs.append((im, cs))

        groups: dict = {}
        for idx, (im, cs) in enumerate(pairs):
            # smallest exported batched (h, w, p) that contains this image
            fits = sorted(
                (k for k in self._batched
                 if k[1] >= im.shape[0] and k[2] >= im.shape[1]
                 and k[3] >= cs.shape[0]),
                key=lambda k: (k[1] * k[2] * k[3], k))
            key = fits[0][1:] if fits else None
            groups.setdefault(key, []).append(idx)

        out: list = [None] * len(pairs)
        for key, idxs in groups.items():
            if key is None:
                for q in idxs:
                    out[q] = self.predict(*pairs[q], vis_thres)
                continue
            hb, wb, pb = key
            counts = sorted(k[0] for k in self._batched if k[1:] == key)
            pos = 0
            while pos < len(idxs):
                chunk = idxs[pos:pos + counts[-1]]
                pos += len(chunk)
                nb = next(n for n in counts if n >= len(chunk))
                if len(chunk) == 1:
                    im, cs = pairs[chunk[0]]
                    try:   # a fitting single-image program is cheaper
                        self._pick(_bucket(im.shape[0], IMG_BUCKETS),
                                   _bucket(im.shape[1], IMG_BUCKETS),
                                   _bucket(cs.shape[0], POSE_BUCKETS))
                    except RuntimeError:
                        pass   # artifact has only the batched program: pad rows
                    else:
                        out[chunk[0]] = self.predict(im, cs, vis_thres)
                        continue
                imgs = np.zeros((nb, hb, wb, 3), np.uint8)
                cnds = np.zeros((nb, pb, self.num_joints, 3), np.float32)
                whs = np.ones((nb, 2), np.float32)
                for row, q in enumerate(chunk):
                    im, cs = pairs[q]
                    imgs[row, :im.shape[0], :im.shape[1]] = im
                    cnds[row, :cs.shape[0]] = cs
                    if cs.shape[0] < pb:   # pad with copies of the first pose
                        cnds[row, cs.shape[0]:] = cs[:1]
                    whs[row] = (im.shape[1], im.shape[0])
                for row in range(len(chunk), nb):   # pad rows: repeat the last
                    imgs[row], cnds[row], whs[row] = (imgs[len(chunk) - 1],
                                                      cnds[len(chunk) - 1],
                                                      whs[len(chunk) - 1])
                preds, maxvals = self._load((nb, hb, wb, pb))(
                    self.variables, imgs, cnds, whs)
                preds, maxvals = np.asarray(preds), np.asarray(maxvals)
                for row, q in enumerate(chunk):
                    P = pairs[q][1].shape[0]
                    res = np.concatenate(
                        [preds[row], maxvals[row]], axis=2)[:P]
                    res[res[:, :, 2] < vis_thres] = np.nan
                    out[q] = res
        return out
