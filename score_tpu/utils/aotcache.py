"""Disk cache of AOT-compiled XLA executables.

The axon remote-compile path does not hit JAX's persistent compilation
cache, so every fresh process pays the full remote compile (~5-25 min
per distinct solver graph; the six bench workloads together need ~68
min against a ~37 min driver window). PJRT *executables*, however,
serialize: this module snapshots a compiled executable to disk and
reloads it in later processes — `jax.experimental.serialize_executable`
bypasses the compile-cache machinery entirely.

Two-level keying (so source edits do not nuke the world):

- **blob** (`<tag>-hlo-<digest>.pkl`): the serialized executable, keyed
  on a digest of the *lowered StableHLO* of the computation plus the
  jax version / backend / device kind. Any edit that leaves the traced
  graph unchanged (docstrings, plotting code, host-side logic) keys to
  the same blob — no recompile.
- **alias** (`<tag>-<digest>.alias`): a tiny pointer file keyed on the
  cheap signature (avals + statics + package-source digest +
  graph-affecting ``SCORE_TPU_*`` env knobs). A fresh process with
  unchanged sources resolves the alias without paying the trace/lower;
  after a graph-irrelevant source edit the first process re-lowers
  once (seconds to ~2 min for the largest batch graph), adopts the
  existing blob, and writes a new alias so later processes are fast
  again.

The graph-affecting env knobs are part of the cheap key AND implicitly
part of the blob key (they change the traced graph), so flipping e.g.
``SCORE_TPU_CR_MIN_LANES`` can never load a stale executable compiled
under the old setting.

Eviction: blobs are touched on load and the cache is pruned
oldest-mtime-first to ``SCORE_TPU_AOT_CACHE_MAX_BYTES`` (default 24 GB)
after every save; dangling aliases are dropped on resolve.

Trust model: cache entries are pickles (the executable payload plus the
in/out pytree defs — the trees themselves require pickling). Loading a
pickle executes code, so the cache dir is created mode 0o700 and must
not be shared or writable by other users; point ``SCORE_TPU_AOT_CACHE``
somewhere private if the default home is not.

Fail-open by design: any error in keying, lowering, loading, or saving
falls back to the plain jit call. The cache is only consulted on TPU by
default (CPU compiles are fast); set ``SCORE_TPU_AOT_CACHE=<dir>`` to
force it on (tests), ``SCORE_TPU_AOT_CACHE=0`` to disable.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
import tempfile
from typing import Any, Dict, Optional

import jax

logger = logging.getLogger(__name__)

__all__ = ["call_cached", "cache_dir", "enabled"]

# process-level executable memo (plays the role of jit's own call cache,
# which the AOT path bypasses)
_EXES: Dict[str, Any] = {}
_SOURCE_DIGEST: Optional[str] = None

# Env knobs that change the TRACED GRAPH (kernel routing, precision
# emulation, compaction thresholds). They are implicitly part of the
# blob key (different graph -> different StableHLO) and must be part of
# the cheap alias key so a flipped knob never resolves to the alias
# written under the old setting (ADVICE r4).
_GRAPH_ENV_VARS = (
    "SCORE_TPU_EXACT_MM",
    "SCORE_TPU_BLOCKED_ARROW",
    "SCORE_TPU_PALLAS_PCR",
    "SCORE_TPU_PALLAS",
    "SCORE_TPU_CR_MIN_LANES",
    "SCORE_TPU_F64_NMANT",
    "SCORE_TPU_AUTO_MIXED",
    "SCORE_TPU_NO_X64",
    "SCORE_TPU_NO_HIGHEST_MATMUL",
)

_DEFAULT_MAX_BYTES = 24 << 30


def cache_dir() -> str:
    env = os.environ.get("SCORE_TPU_AOT_CACHE", "")
    if env and env != "0" and env != "1":
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "score_tpu", "aot"
    )


def _max_bytes() -> int:
    return int(
        os.environ.get("SCORE_TPU_AOT_CACHE_MAX_BYTES", _DEFAULT_MAX_BYTES)
    )


def enabled() -> bool:
    env = os.environ.get("SCORE_TPU_AOT_CACHE", "")
    if env == "0":
        return False
    if env:  # explicit dir or "1": force on (any backend)
        return True
    return jax.default_backend() == "tpu"


def _source_digest() -> str:
    """Content hash of the package sources. Only the cheap alias key
    depends on it: a code change invalidates aliases (one re-lower to
    rebuild), not the compiled blobs. One pass per process (~1 ms)."""
    global _SOURCE_DIGEST
    if _SOURCE_DIGEST is None:
        import score_tpu

        root = os.path.dirname(os.path.abspath(score_tpu.__file__))
        h = hashlib.blake2b(digest_size=16)
        for dirpath, dirnames, filenames in sorted(os.walk(root)):
            dirnames.sort()
            for fn in sorted(filenames):
                if fn.endswith(".py"):
                    p = os.path.join(dirpath, fn)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SOURCE_DIGEST = h.hexdigest()
    return _SOURCE_DIGEST


def _leaf_sig(x) -> tuple:
    if hasattr(x, "shape") and hasattr(x, "dtype"):
        # Multi-device sharding participates in the key: the same shapes
        # laid out over a different mesh compile to a different
        # executable. Single-device placement is normalized to "" so a
        # host numpy leaf and the same value already device-resident
        # (e.g. the memoized assembly cache) key identically — they
        # compile to the same executable.
        sh = getattr(x, "sharding", None)
        sig = ""
        if sh is not None and getattr(sh, "num_devices", 1) > 1:
            sig = repr(sh)
        return ("arr", tuple(x.shape), str(x.dtype), sig)
    return ("val", repr(x))


def _platform_sig() -> tuple:
    dev_kind = ""
    try:
        dev_kind = jax.devices()[0].device_kind
    except Exception:
        pass
    return (jax.__version__, jax.default_backend(), dev_kind)


def _key(tag: str, static_sig: str, dynamic_args: tuple) -> str:
    """Cheap (no-trace) alias key."""
    leaves, treedef = jax.tree_util.tree_flatten(dynamic_args)
    h = hashlib.blake2b(digest_size=16)
    env_sig = tuple(
        (name, os.environ.get(name, "")) for name in _GRAPH_ENV_VARS
    )
    h.update(
        repr(
            (
                tag,
                static_sig,
                str(treedef),
                [_leaf_sig(x) for x in leaves],
                _platform_sig(),
                env_sig,
                _source_digest(),
            )
        ).encode()
    )
    return f"{tag}-{h.hexdigest()}"


def _hlo_key(tag: str, lowered) -> str:
    """Blob key: digest of the lowered StableHLO text. Captures the
    traced graph itself — statics, env knobs, and source content only
    matter through their effect on the graph."""
    h = hashlib.blake2b(digest_size=16)
    h.update(repr((tag, _platform_sig())).encode())
    h.update(lowered.as_text().encode())
    return f"{tag}-hlo-{h.hexdigest()}"


def _ensure_dir() -> str:
    d = cache_dir()
    os.makedirs(d, mode=0o700, exist_ok=True)
    try:  # pre-existing dirs keep their mode from makedirs; tighten
        os.chmod(d, 0o700)
    except OSError:
        pass
    return d


def _blob_path(hlo_key: str) -> str:
    return os.path.join(cache_dir(), hlo_key + ".pkl")


def _alias_path(key: str) -> str:
    return os.path.join(cache_dir(), key + ".alias")


def _resolve_alias(key: str) -> Optional[str]:
    path = _alias_path(key)
    try:
        with open(path) as f:
            hlo_key = json.load(f)["blob"]
    except (OSError, ValueError, KeyError):
        return None
    if not os.path.exists(_blob_path(hlo_key)):
        # dangling alias (blob evicted): drop it
        try:
            os.unlink(path)
        except OSError:
            pass
        return None
    return hlo_key


def _write_alias(key: str, hlo_key: str) -> None:
    d = _ensure_dir()
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"blob": hlo_key}, f)
    os.replace(tmp, _alias_path(key))


def _load_blob(hlo_key: str):
    path = _blob_path(hlo_key)
    if not os.path.exists(path):
        return None
    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        blob = pickle.load(f)
    # Restore the executable onto the devices it was compiled for: the
    # default (all addressable devices) breaks a single-device executable
    # on a multi-device client — e.g. the 8-virtual-device CPU test mesh
    # ("expected args to have 8 shards"). Missing ids fail the lookup and
    # the caller falls open to a recompile.
    execution_devices = None
    ids = blob.get("device_ids")
    if ids is not None:
        by_id = {d.id: d for d in jax.devices()}
        execution_devices = [by_id[i] for i in ids]
    exe = deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"],
        execution_devices=execution_devices,
    )
    try:  # LRU touch
        os.utime(path)
    except OSError:
        pass
    logger.info(
        "aotcache: loaded %s (%d bytes)", hlo_key, len(blob["payload"])
    )
    return exe


def _save_blob(hlo_key: str, compiled) -> None:
    from jax.experimental.serialize_executable import serialize

    payload, in_tree, out_tree = serialize(compiled)
    try:
        device_ids = [
            dev.id
            for dev in compiled._executable.xla_executable.local_devices()
        ]
    except Exception:
        device_ids = None
    d = _ensure_dir()
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(
                {"payload": payload, "in_tree": in_tree,
                 "out_tree": out_tree, "device_ids": device_ids},
                f,
            )
        os.replace(tmp, _blob_path(hlo_key))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    logger.info("aotcache: saved %s (%d bytes)", hlo_key, len(payload))
    _evict(keep=hlo_key)


def _evict(keep: str) -> None:
    """Prune blobs oldest-mtime-first until the cache fits the size
    bound; the just-saved entry is never pruned. Loads utime their blob,
    so recency of use orders eviction."""
    d = cache_dir()
    try:
        blobs = []
        for fn in os.listdir(d):
            if not fn.endswith(".pkl"):
                continue
            p = os.path.join(d, fn)
            st = os.stat(p)
            blobs.append((st.st_mtime, st.st_size, fn, p))
        total = sum(b[1] for b in blobs)
        limit = _max_bytes()
        for mtime, size, fn, p in sorted(blobs):
            if total <= limit:
                break
            if fn == keep + ".pkl":
                continue
            os.unlink(p)
            total -= size
            logger.info("aotcache: evicted %s (%d bytes)", fn, size)
    except OSError:
        logger.exception("aotcache: eviction scan failed (continuing)")


def _drop_entry(key: str, hlo_key: Optional[str]) -> None:
    _EXES.pop(key, None)
    for p in filter(None, (
        _alias_path(key),
        _blob_path(hlo_key) if hlo_key else None,
    )):
        try:
            os.unlink(p)
        except OSError:
            pass


def call_cached(
    jitted,
    lower_args: tuple,
    static_kwargs: Dict[str, Any],
    dynamic_args: tuple,
    tag: str,
    static_sig: Optional[str] = None,
):
    """Call ``jitted(*lower_args, **static_kwargs)`` through the disk
    executable cache.

    ``lower_args``/``static_kwargs`` mirror the jit call signature (the
    static arguments must be keywords); ``dynamic_args`` are the
    non-static arguments in positional order — what the AOT-compiled
    executable is invoked with. ``static_sig`` overrides the cache-key
    contribution of the statics (defaults to ``repr(static_kwargs)``,
    which must be deterministic and content-complete for the statics in
    use)."""
    if not enabled():
        return jitted(*lower_args, **static_kwargs)
    try:
        key = _key(tag, static_sig or repr(sorted(static_kwargs.items())),
                   dynamic_args)
    except Exception:
        logger.exception("aotcache: keying failed; plain jit call")
        return jitted(*lower_args, **static_kwargs)

    hlo_key = None
    exe = _EXES.get(key)
    if exe is None:
        try:
            hlo_key = _resolve_alias(key)
            if hlo_key is not None:
                exe = _load_blob(hlo_key)
        except Exception:
            logger.exception("aotcache: alias load failed; re-keying")
            exe = None
    if exe is None:
        # alias miss: trace + lower once to key on the graph itself
        lowered = None
        try:
            lowered = jitted.lower(*lower_args, **static_kwargs)
            hlo_key = _hlo_key(tag, lowered)
            exe = _load_blob(hlo_key)
            if exe is not None:
                # a source edit that left the graph unchanged: adopt the
                # existing executable and relink the alias
                _write_alias(key, hlo_key)
                logger.info("aotcache: adopted %s for %s", hlo_key, key)
        except Exception:
            logger.exception("aotcache: lower/adopt failed; recompiling")
            exe = None
        if exe is None:
            try:
                if lowered is None:
                    lowered = jitted.lower(*lower_args, **static_kwargs)
                exe = lowered.compile()
            except Exception:
                logger.exception("aotcache: AOT lower/compile failed; "
                                 "plain jit call")
                return jitted(*lower_args, **static_kwargs)
            try:
                if hlo_key is None:
                    hlo_key = _hlo_key(tag, lowered)
                _save_blob(hlo_key, exe)
                _write_alias(key, hlo_key)
            except Exception:
                logger.exception("aotcache: save failed (continuing)")
    _EXES[key] = exe
    try:
        return exe(*dynamic_args)
    except Exception:
        # stale/incompatible executable (device renumbering, runtime
        # version drift): drop it and recompile through the plain path
        logger.exception("aotcache: cached executable failed; dropping "
                         "%s and recompiling", key)
        _drop_entry(key, hlo_key)
        return jitted(*lower_args, **static_kwargs)
