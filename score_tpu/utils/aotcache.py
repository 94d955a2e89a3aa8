"""Disk cache of AOT-compiled XLA executables.

The axon remote-compile path does not hit JAX's persistent compilation
cache, so every fresh process pays the full remote compile (~5-25 min
per distinct solver graph; the six bench workloads together need ~68
min against a ~37 min driver window). PJRT *executables*, however,
serialize: this module snapshots a compiled executable to disk keyed on
the package source content, jax version, platform, static arguments,
and the dynamic arguments' avals, and reloads it in later processes —
`jax.experimental.serialize_executable` bypasses the compile-cache
machinery entirely.

Fail-open by design: any error in keying, loading, or saving falls back
to the plain jit call. The cache is only consulted on TPU by default
(CPU compiles are fast); set ``SCORE_TPU_AOT_CACHE=<dir>`` to force it
on (tests), ``SCORE_TPU_AOT_CACHE=0`` to disable.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
import tempfile
from typing import Any, Dict, Optional, Tuple

import jax

logger = logging.getLogger(__name__)

__all__ = ["call_cached", "cache_dir", "enabled"]

# process-level executable memo (plays the role of jit's own call cache,
# which the AOT path bypasses)
_EXES: Dict[str, Any] = {}
_SOURCE_DIGEST: Optional[str] = None


def cache_dir() -> str:
    env = os.environ.get("SCORE_TPU_AOT_CACHE", "")
    if env and env != "0" and env != "1":
        return env
    return os.path.join(
        os.path.expanduser("~"), ".cache", "score_tpu", "aot"
    )


def enabled() -> bool:
    env = os.environ.get("SCORE_TPU_AOT_CACHE", "")
    if env == "0":
        return False
    if env:  # explicit dir or "1": force on (any backend)
        return True
    return jax.default_backend() == "tpu"


def _source_digest() -> str:
    """Content hash of the package sources: any code change invalidates
    every cached executable (the graph may differ). One pass per process
    (~1 ms)."""
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


def _key(tag: str, static_sig: str, dynamic_args: tuple) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(dynamic_args)
    h = hashlib.blake2b(digest_size=16)
    dev_kind = ""
    try:
        dev_kind = jax.devices()[0].device_kind
    except Exception:
        pass
    h.update(
        repr(
            (
                tag,
                static_sig,
                str(treedef),
                [_leaf_sig(x) for x in leaves],
                jax.__version__,
                jax.default_backend(),
                dev_kind,
                _source_digest(),
            )
        ).encode()
    )
    return f"{tag}-{h.hexdigest()}"


def _load(key: str):
    path = os.path.join(cache_dir(), key + ".pkl")
    if not os.path.exists(path):
        return None
    from jax.experimental.serialize_executable import deserialize_and_load

    with open(path, "rb") as f:
        blob = pickle.load(f)
    exe = deserialize_and_load(
        blob["payload"], blob["in_tree"], blob["out_tree"]
    )
    logger.info("aotcache: loaded %s (%d bytes)", key, len(blob["payload"]))
    return exe


def _save(key: str, compiled) -> None:
    from jax.experimental.serialize_executable import serialize

    payload, in_tree, out_tree = serialize(compiled)
    d = cache_dir()
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            pickle.dump(
                {"payload": payload, "in_tree": in_tree,
                 "out_tree": out_tree},
                f,
            )
        os.replace(tmp, os.path.join(d, key + ".pkl"))
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    logger.info("aotcache: saved %s (%d bytes)", key, len(payload))


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

    exe = _EXES.get(key)
    if exe is None:
        try:
            exe = _load(key)
        except Exception:
            logger.exception("aotcache: load failed; recompiling")
            exe = None
    if exe is None:
        try:
            exe = jitted.lower(*lower_args, **static_kwargs).compile()
        except Exception:
            logger.exception("aotcache: AOT lower/compile failed; "
                             "plain jit call")
            return jitted(*lower_args, **static_kwargs)
        try:
            _save(key, exe)
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
        _EXES.pop(key, None)
        try:
            os.unlink(os.path.join(cache_dir(), key + ".pkl"))
        except OSError:
            pass
        return jitted(*lower_args, **static_kwargs)
