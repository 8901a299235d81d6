"""Checkpoint / resume for long runs.

The reference has no persistence at all (SURVEY.md §5: state lives in RAM,
results exported only at shutdown).  Long pod runs need resumable state, so
the front-end carry (a pytree of arrays) plus the host-side node/edge tables
snapshot to a single ``.npz``.
"""

from __future__ import annotations

import json

import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if hasattr(tree, "_asdict"):
        tree = tree._asdict()
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_carry(path: str, carry, extra: dict | None = None):
    """Snapshot a FrontendCarry (or any NamedTuple pytree) to .npz."""
    flat = _flatten(carry)
    if extra:
        for k, v in extra.items():
            flat[f"__extra__/{k}"] = np.asarray(v)
    np.savez_compressed(path, **flat)


def load_carry(path: str, template):
    """Rebuild a carry pytree with the structure of ``template`` from .npz.

    Fields missing from the snapshot keep the TEMPLATE's value — carries
    saved before a field was added (e.g. the round-4 derived-field caches)
    stay loadable.  Safe only for fields whose template default is a valid
    empty state; the derived caches are rebuilt at the next keyframe exit.
    """
    import jax.numpy as jnp

    data = np.load(path)

    def rebuild(node, prefix=""):
        if hasattr(node, "_asdict") and hasattr(node, "_replace"):
            kw = {
                k: rebuild(v, f"{prefix}{k}/")
                for k, v in node._asdict().items()
            }
            return type(node)(**kw)
        key = prefix.rstrip("/")
        if key not in data.files:
            return node  # pre-existing checkpoint without this field
        return jnp.asarray(data[key])

    return rebuild(template)


def load_extra(path: str) -> dict:
    data = np.load(path)
    return {
        k.split("/", 1)[1]: data[k]
        for k in data.files
        if k.startswith("__extra__/")
    }
