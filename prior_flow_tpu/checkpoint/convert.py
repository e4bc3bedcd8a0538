"""PyTorch ``.pth`` -> JAX/Flax checkpoint conversion.

Reproduces both reference restore paths (SURVEY.md §5 "Checkpoint / resume"):

1. **exact load** — a full PriOr-RAFT ``state_dict`` (possibly wrapped in a
   ``module.`` DataParallel prefix) maps 1:1 onto our Flax variables
   (reference ``load_state_dict(strict=True)``, train_flow.py:101,
   evaluate.py:411);
2. **FlyingThings graft** — upstream-RAFT weights are copied where shapes
   match, and the ODDC block's ``gru`` / ``flow_head`` / ``mask`` are seeded
   from RAFT's ``update_block`` (reference ``load_things_ckpt``,
   core/prior_raft.py:85-104).

Layout transforms (torch NCHW -> flax NHWC):
- Conv2d weight ``(O, I, kh, kw)`` -> kernel ``(kh, kw, I, O)``;
- BatchNorm ``weight``/``bias`` -> params ``scale``/``bias``;
  ``running_mean``/``running_var`` -> batch_stats ``mean``/``var``.

The torch->flax *name* map is mechanical because the Flax modules reuse the
reference attribute names (``fnet.layer1.0.conv1`` -> ``fnet/layer1_0/conv1``,
``ODDC.mask.0`` -> ``ODDC/mask_0`` etc.).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

try:  # torch is only needed for reading .pth files
    import torch
except ImportError:  # pragma: no cover
    torch = None


def _strip_module_prefix(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Drop the DataParallel ``module.`` prefix (prior_raft.py:89-92)."""
    out = {}
    for k, v in state_dict.items():
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def _to_numpy(t) -> np.ndarray:
    if torch is not None and isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _flax_path(torch_key: str) -> Tuple[Tuple[str, ...], str, str]:
    """torch state_dict key -> (flax module path, leaf name, collection).

    Returns collection 'params', 'batch_stats', or 'skip'.
    """
    parts = torch_key.split(".")
    leaf = parts[-1]
    mods = parts[:-1]

    if leaf == "num_batches_tracked":
        return (), "", "skip"

    out_mods = []
    i = 0
    while i < len(mods):
        m = mods[i]
        if m in ("layer1", "layer2", "layer3") and i + 1 < len(mods) and mods[i + 1].isdigit():
            out_mods.append(f"{m}_{mods[i + 1]}")
            i += 2
            continue
        if m == "downsample" and i + 1 < len(mods) and mods[i + 1].isdigit():
            idx = mods[i + 1]
            if idx == "0":
                out_mods.append("downsample_0")
                i += 2
                continue
            # downsample.1 duplicates norm3 (same torch module registered
            # twice, extractor.py:38-39) — skip the duplicate entry.
            return (), "", "skip"
        if m == "mask" and i + 1 < len(mods) and mods[i + 1].isdigit():
            out_mods.append(f"mask_{mods[i + 1]}")
            i += 2
            continue
        out_mods.append(m)
        i += 1

    # leaf translation
    if leaf == "weight":
        return tuple(out_mods), "weight", "params"
    if leaf == "bias":
        return tuple(out_mods), "bias", "params"
    if leaf == "running_mean":
        return tuple(out_mods), "mean", "batch_stats"
    if leaf == "running_var":
        return tuple(out_mods), "var", "batch_stats"
    return (), "", "skip"


def _set_in(tree: Dict, path: Tuple[str, ...], value) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_in(tree: Mapping, path: Tuple[str, ...]):
    node = tree
    for p in path:
        node = node[p]
    return node


def convert_state_dict(state_dict: Mapping[str, Any],
                       template: Mapping[str, Any] | None = None
                       ) -> Dict[str, Dict]:
    """Convert a (stripped) PriOr-RAFT torch state_dict into Flax variables.

    ``template`` (optional): variables from ``model.init`` used to decide
    whether a ``weight`` leaf is a conv kernel or a norm scale, and to verify
    completeness. Without a template the decision is made from tensor rank
    (4D = conv kernel, 1D = norm scale), which is unambiguous here.
    """
    sd = _strip_module_prefix(state_dict)
    params: Dict = {}
    batch_stats: Dict = {}

    for key, tensor in sd.items():
        path, leaf, coll = _flax_path(key)
        if coll == "skip":
            continue
        arr = _to_numpy(tensor)
        if coll == "batch_stats":
            _set_in(batch_stats, path + (leaf,), arr.astype(np.float32))
            continue
        if leaf == "weight":
            if arr.ndim == 4:  # conv kernel OIHW -> HWIO
                _set_in(params, path + ("kernel",),
                        np.transpose(arr, (2, 3, 1, 0)).astype(np.float32))
            else:  # norm scale
                _set_in(params, path + ("scale",), arr.astype(np.float32))
        elif leaf == "bias":
            _set_in(params, path + ("bias",), arr.astype(np.float32))

    out = {"params": params}
    if batch_stats:
        out["batch_stats"] = batch_stats

    if template is not None:
        _verify_against_template(out, template)
    return out


def _flatten(tree, prefix=()):
    items = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            items.update(_flatten(v, prefix + (k,)))
        else:
            items[prefix + (k,)] = v
    return items


def _verify_against_template(converted, template):
    for coll in template:
        tflat = _flatten(template[coll])
        cflat = _flatten(converted.get(coll, {}))
        missing = set(tflat) - set(cflat)
        extra = set(cflat) - set(tflat)
        if missing or extra:
            raise ValueError(
                f"checkpoint mismatch in {coll}: missing={sorted(missing)[:8]} "
                f"extra={sorted(extra)[:8]}")
        for k, v in tflat.items():
            if tuple(np.shape(v)) != tuple(np.shape(cflat[k])):
                raise ValueError(
                    f"shape mismatch at {coll}/{'/'.join(k)}: "
                    f"template {np.shape(v)} vs checkpoint {np.shape(cflat[k])}")


def convert_things_ckpt(state_dict: Mapping[str, Any],
                        template: Mapping[str, Any]) -> Dict[str, Dict]:
    """Cross-architecture graft from upstream-RAFT FlyingThings weights.

    Mirrors ``load_things_ckpt`` (core/prior_raft.py:85-104): start from the
    randomly-initialised ``template`` variables; copy every converted tensor
    whose path+shape matches; additionally seed ``ODDC/{gru,flow_head,
    mask_*}`` from the checkpoint's ``update_block`` equivalents.
    """
    import jax

    conv = convert_state_dict(state_dict)
    out = jax.tree_util.tree_map(np.asarray, dict(template))

    for coll in ("params", "batch_stats"):
        if coll not in template:
            continue
        tflat = _flatten(template[coll])
        cflat = _flatten(conv.get(coll, {}))
        new = dict(_flatten(out[coll]))
        for path, tval in tflat.items():
            src = None
            if path in cflat and np.shape(cflat[path]) == np.shape(tval):
                src = cflat[path]
            elif path and path[0] == "ODDC" and len(path) > 1 and (
                    path[1] in ("gru", "flow_head") or path[1].startswith("mask_")):
                alt = ("update_block",) + path[1:]
                if alt in cflat and np.shape(cflat[alt]) == np.shape(tval):
                    src = cflat[alt]
            if src is not None:
                new[path] = src.astype(np.asarray(tval).dtype)
        rebuilt: Dict = {}
        for path, val in new.items():
            _set_in(rebuilt, path, val)
        out[coll] = rebuilt
    return out


def export_state_dict(variables: Mapping[str, Any],
                      add_module_prefix: bool = True) -> Dict[str, np.ndarray]:
    """Inverse conversion: Flax variables -> a PyTorch-layout state dict.

    Lets TPU-trained weights round-trip into the reference's ``.pth``
    convention (NCHW kernels, ``module.``-prefixed keys, BatchNorm stats as
    running_mean/var) so they can be evaluated with the original PyTorch
    code base.
    """
    out: Dict[str, np.ndarray] = {}

    def walk(tree, path, coll):
        for k, v in tree.items():
            if isinstance(v, Mapping):
                walk(v, path + (k,), coll)
                continue
            arr = np.asarray(v)
            mods = []
            for m in path:
                if m.startswith(("layer1_", "layer2_", "layer3_")):
                    base, idx = m.rsplit("_", 1)
                    mods += [base, idx]
                elif m.startswith("mask_"):
                    mods += ["mask", m.split("_", 1)[1]]
                elif m == "downsample_0":
                    mods += ["downsample", "0"]
                else:
                    mods.append(m)
            name = ".".join(mods)
            if coll == "batch_stats":
                leaf = {"mean": "running_mean", "var": "running_var"}[k]
            elif k == "kernel":
                leaf = "weight"
                arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
            elif k == "scale":
                leaf = "weight"
            else:
                leaf = "bias"
            out[f"{name}.{leaf}"] = arr

    walk(variables.get("params", {}), (), "params")
    walk(variables.get("batch_stats", {}), (), "batch_stats")

    # the reference registers each strided block's norm3 a second time as
    # downsample.1 (extractor.py:38-39), so its state_dict carries duplicate
    # tensors under both names; re-emit the aliases the import path skipped
    for key in [k for k in out if ".downsample.0." in k]:
        block = key.split(".downsample.0.")[0]
        for k2 in [k for k in out if k.startswith(f"{block}.norm3.")]:
            out[k2.replace(".norm3.", ".downsample.1.")] = out[k2]

    if add_module_prefix:
        out = {f"module.{k}": v for k, v in out.items()}
    return out


def load_pth(path: str) -> Dict[str, Any]:
    """Read a torch checkpoint file to a {key: numpy} dict."""
    if torch is None:
        raise RuntimeError("torch is required to read .pth checkpoints")
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, Mapping) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: _to_numpy(v) for k, v in _strip_module_prefix(sd).items()}
