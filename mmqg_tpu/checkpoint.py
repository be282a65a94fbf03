"""Checkpointing: best/last aliases + full train-resume.

The reference saved three separate torch state_dicts plus the embedding tensor
(best-by-val-loss at train.py:197-206, last-epoch at train.py:208-214) and had
**no resume path** — optimizer state and epoch counter were lost. Here one
msgpack checkpoint holds the whole train state (params, BN state, optimizer
state, step/epoch, val metric), with "best" and "last" aliases preserving the
evaluate CLI contract (reference evaluate.py:131-138 ``--best/--last``).

Formats (selectable per save; load auto-detects):

* ``msgpack`` (default) — flax.serialization msgpack for the pytree + a JSON
  sidecar with metadata (step, epoch, metric, model config) —
  dependency-light, stable, and mesh-agnostic (arrays are saved fully
  replicated; ``shard_params`` re-places them on load).
* ``orbax`` — an Orbax ``StandardCheckpointer`` directory
  (``<ckpt_dir>/<alias>.orbax/``) for ecosystem interop (tensorstore layout,
  readable by any orbax consumer). Same alias + JSON-metadata contract.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    return jax.tree.map(
        lambda x: np.asarray(x) if hasattr(x, "ndim") else x, tree)


# One serial writer thread: async saves keep submission order (so a queued
# "best" then "last" to the same alias can never interleave) and the train
# loop only pays for the device->host gather, not serialisation + disk.
_writer = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt")
_pending: list = []


def wait_for_pending() -> None:
    """Block until all async checkpoint writes have been published; re-raises
    the first writer error."""
    while _pending:
        _pending.pop(0).result()


def _orbax_path(ckpt_dir: Path, alias: str) -> Path:
    return (Path(ckpt_dir) / f"{alias}.orbax").resolve()


def _save_orbax(ckpt_dir: Path, alias: str, train_state: Dict) -> Path:
    import orbax.checkpoint as ocp

    path = _orbax_path(ckpt_dir, alias)
    with ocp.StandardCheckpointer() as ckptr:
        # orbax state_dict-ifies via flax too, so NamedTuple optax states
        # round-trip the same way as the msgpack backend
        ckptr.save(path, serialization.to_state_dict(_to_host(train_state)),
                   force=True)
    return path


def _load_orbax(ckpt_dir: Path, alias: str, template: Dict) -> Dict:
    import orbax.checkpoint as ocp

    tmpl_sd = serialization.to_state_dict(_to_host(template))
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(_orbax_path(ckpt_dir, alias), tmpl_sd)
    return serialization.from_state_dict(template, restored)


def save_checkpoint(ckpt_dir: Path, alias: str, train_state: Dict,
                    metadata: Optional[Dict[str, Any]] = None,
                    backend: str = "msgpack",
                    async_save: bool = False) -> Path:
    """Write ``<ckpt_dir>/<alias>.msgpack`` or ``<alias>.orbax/``
    (+ ``<alias>.json`` metadata).

    ``async_save``: gather the state to host synchronously (cheap), then
    serialise + write on a background thread — the train loop does not
    stall on disk. Publication stays atomic (tmp + rename) and ordered
    (single writer thread). Call ``wait_for_pending()`` before reading the
    files or exiting."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    host_state = _to_host(train_state)

    def _write_msgpack() -> Path:
        path = ckpt_dir / f"{alias}.msgpack"
        # to_state_dict flattens NamedTuples (optax states, AttnParams) into
        # msgpack-serialisable dicts; from_state_dict rebuilds them on load
        blob = serialization.msgpack_serialize(
            serialization.to_state_dict(host_state))
        tmp = path.with_suffix(".tmp")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic publish
        _drop_stale(_orbax_path(ckpt_dir, alias))
        _write_meta()
        return path

    def _write_orbax() -> Path:
        path = _save_orbax(ckpt_dir, alias, host_state)
        _drop_stale(ckpt_dir / f"{alias}.msgpack")
        _write_meta()
        return path

    def _drop_stale(other: Path) -> None:
        # the alias's OTHER-backend artifact is now stale; leaving it would
        # make a later auto-detecting load resume old weights against the
        # fresh metadata (load prefers msgpack when both exist)
        import shutil
        if other.is_dir():
            shutil.rmtree(other, ignore_errors=True)
        elif other.exists():
            other.unlink()

    def _write_meta() -> None:
        if metadata is not None:
            with open(ckpt_dir / f"{alias}.json", "w") as f:
                json.dump(metadata, f, indent=2, default=str)

    if backend == "orbax":
        write = _write_orbax
    elif backend == "msgpack":
        write = _write_msgpack
    else:
        raise ValueError(f"unknown checkpoint backend {backend!r}")
    if async_save:
        _pending.append(_writer.submit(write))
        return (ckpt_dir / f"{alias}.msgpack" if backend == "msgpack"
                else _orbax_path(ckpt_dir, alias))
    return write()


def copy_checkpoint(ckpt_dir: Path, src_alias: str, dst_alias: str,
                    backend: str = "msgpack",
                    async_copy: bool = False) -> None:
    """Duplicate a published alias (artifact + metadata sidecar) on disk —
    e.g. ``best`` from a just-written ``last`` — without re-gathering or
    re-serialising the train state (saving the same state twice costs two
    device->host gathers + two serialisations for identical bytes). Runs on
    the ordered writer thread when ``async_copy`` so it always sees the
    completed source write."""
    ckpt_dir = Path(ckpt_dir)

    def _copy() -> None:
        import shutil
        if backend == "orbax":
            src, dst = _orbax_path(ckpt_dir, src_alias), _orbax_path(
                ckpt_dir, dst_alias)
            # atomic publish, mirroring the msgpack path: stage the copy
            # into a temporary sibling, then rename over the destination —
            # a crash mid-copy must not leave a partial dst_alias
            tmp = dst.with_name(dst.name + ".tmp")
            if tmp.exists():
                shutil.rmtree(tmp, ignore_errors=True)
            shutil.copytree(src, tmp)
            if dst.exists():
                shutil.rmtree(dst, ignore_errors=True)
            os.replace(tmp, dst)
            stale = ckpt_dir / f"{dst_alias}.msgpack"
        else:
            src = ckpt_dir / f"{src_alias}.msgpack"
            dst = ckpt_dir / f"{dst_alias}.msgpack"
            tmp = dst.with_suffix(".tmp")
            shutil.copyfile(src, tmp)
            os.replace(tmp, dst)  # atomic publish
            stale = _orbax_path(ckpt_dir, dst_alias)
        if stale.is_dir():
            shutil.rmtree(stale, ignore_errors=True)
        elif stale.exists():
            stale.unlink()
        meta = ckpt_dir / f"{src_alias}.json"
        if meta.exists():
            shutil.copyfile(meta, ckpt_dir / f"{dst_alias}.json")

    if async_copy:
        _pending.append(_writer.submit(_copy))
    else:
        wait_for_pending()  # the source write must have landed
        _copy()


def load_checkpoint(ckpt_dir: Path, alias: str,
                    template: Dict) -> Tuple[Dict, Dict[str, Any]]:
    """Restore into the structure of ``template``; returns (state, metadata).
    The backend is auto-detected from what exists on disk (msgpack preferred
    when both are present)."""
    wait_for_pending()  # never read around an in-flight async write
    ckpt_dir = Path(ckpt_dir)
    mp = ckpt_dir / f"{alias}.msgpack"
    if mp.exists():
        with open(mp, "rb") as f:
            restored = serialization.msgpack_restore(f.read())
        state = serialization.from_state_dict(template, restored)
    elif _orbax_path(ckpt_dir, alias).exists():
        state = _load_orbax(ckpt_dir, alias, template)
    else:
        raise FileNotFoundError(f"no '{alias}' checkpoint in {ckpt_dir}")
    meta_path = ckpt_dir / f"{alias}.json"
    metadata = {}
    if meta_path.exists():
        with open(meta_path) as f:
            metadata = json.load(f)
    return state, metadata


def has_checkpoint(ckpt_dir: Path, alias: str) -> bool:
    return ((Path(ckpt_dir) / f"{alias}.msgpack").exists()
            or _orbax_path(ckpt_dir, alias).exists())
