"""Persistent COMPILED-EXECUTABLE cache for the axon/TPU backend.

Why this exists: on this backend, `jit(f).lower().compile()` returns in
<1s — the real TPU/Mosaic compilation is DEFERRED to first execution,
which blocks for minutes per executable through the tunnel. jax's own
persistent compilation cache is keyed on the compile() step it can see,
concludes every compile took <1s, and never stores anything useful — so
every process paid full recompiles (round-3 BENCH: 82.8s setup + 214.2s
warmup with a "warm" cache).

Fix (measured: 326s first-exec -> 0.38s in a fresh process,
scripts/probe_cache3.py): after the FIRST EXECUTION (which forces the
deferred backend compile), `jax.experimental.serialize_executable` can
serialize the fully-compiled executable; `deserialize_and_load` in a new
process runs immediately. This module wraps jax.jit with that scheme:

    fn = cached_jit(f)          # drop-in for jax.jit(f)
    fn(*args)                   # loads from disk if cached, else
                                # compiles once, runs, then persists

Keying: sha256 of the lowered StableHLO text + jaxlib version + platform
+ arg signature. Lowering is cheap (~0.1s) and gives content-addressed
correctness like jax's own cache. Any failure falls back to plain jit.

The reference needs none of this (a Go binary starts compiled); the cache
is the TPU-native equivalent of its ahead-of-time build.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import threading

import jax

_DIR = os.environ.get("CURDLE_EXE_CACHE", "/root/repo/.exe_cache")
_ENABLED = os.environ.get("CURDLE_EXE_CACHE_ENABLE", "auto")

# Drop python source locations from lowered modules: the cache key hashes
# the StableHLO text, and embedded file:line locations would invalidate
# every entry on ANY edit to a file in the traced call path.
try:
    jax.config.update("jax_include_full_tracebacks_in_locations", False)
    jax.config.update("jax_traceback_in_locations_limit", 0)
except Exception:            # pragma: no cover — older/newer jax
    pass

_lock = threading.Lock()
_fingerprint = None
_DEBUG = os.environ.get("CURDLE_EXE_CACHE_DEBUG", "0") == "1"


def _debug(msg: str) -> None:
    if _DEBUG:
        import sys
        print(msg, file=sys.stderr, flush=True)


_trusted = None


def _dir_trusted() -> bool:
    """Refuse to unpickle cached executables from a group/world-writable
    cache dir: deserialize_and_load payloads are pickles, and unpickling
    attacker-writable bytes is arbitrary code execution. (The dir is
    created 0o700 below; this check guards pre-existing/poisoned dirs.)"""
    global _trusted
    if _trusted is None:
        try:
            st = os.stat(_DIR)
            _trusted = (st.st_mode & 0o022) == 0 and st.st_uid == os.getuid()
        except OSError:
            _trusted = False
        if not _trusted:
            _debug(f"exe_cache UNTRUSTED dir {_DIR} (writable by others); "
                   "loads disabled")
    return _trusted


def _enabled() -> bool:
    if _ENABLED == "0":
        return False
    if _ENABLED == "1":
        return True
    # auto: only where deferred backend compiles make it worthwhile
    return jax.default_backend() not in ("cpu",)


def _backend_fingerprint() -> bytes:
    global _fingerprint
    if _fingerprint is None:
        d = jax.devices()[0]
        _fingerprint = (f"{jax.version.__version__}|{d.platform}|"
                        f"{getattr(d, 'device_kind', '?')}").encode()
    return _fingerprint


def _sig(tree) -> str:
    """In-process signature of a call: every leaf becomes a shape:dtype
    descriptor (non-array leaves key by value) and the containers are
    repr'd WITH their pytree aux metadata — str(PyTreeDef) omits aux like
    the field elements' interval tags, which changes the compiled
    calling convention."""
    def desc(leaf):
        shape = getattr(leaf, "shape", None)
        return repr(leaf) if shape is None else f"{shape}:{leaf.dtype}"

    return repr(jax.tree_util.tree_map(desc, tree))


class CachedJit:
    """jax.jit wrapper that persists fully-compiled executables to disk."""

    def __init__(self, fn, static_argnames=None, name=None):
        kw = {}
        if static_argnames:
            kw["static_argnames"] = static_argnames
        self._jit = jax.jit(fn, **kw)
        self._static = frozenset(static_argnames or ())
        self._name = name or getattr(fn, "__name__", "fn")
        self._exes = {}

    def _dyn_kwargs(self, kwargs):
        """Static kwargs are baked into the executable; the AOT Compiled
        object only accepts the dynamic arguments."""
        if not self._static:
            return kwargs
        return {k: v for k, v in kwargs.items() if k not in self._static}

    def lower(self, *args, **kwargs):
        return self._jit.lower(*args, **kwargs)

    def __call__(self, *args, **kwargs):
        if not _enabled():
            return self._jit(*args, **kwargs)
        if any(isinstance(leaf, jax.core.Tracer)
               for leaf in jax.tree_util.tree_leaves((args, kwargs))):
            return self._jit(*args, **kwargs)   # nested under another trace
        sig = _sig((args, sorted(kwargs.items())))
        exe = self._exes.get(sig)
        if exe is None:
            exe = self._load_or_compile(args, kwargs, sig)
            self._exes[sig] = exe
        if exe is False:                 # cache path failed once: plain jit
            return self._jit(*args, **kwargs)
        return exe(*args, **self._dyn_kwargs(kwargs))

    def _load_or_compile(self, args, kwargs, sig):
        try:
            from jax.experimental import serialize_executable as se

            lowered = self._jit.lower(*args, **kwargs)
            # the serialized executable pins the input PYTREE (incl. aux
            # metadata like field-element interval tags); two signatures
            # can lower to IDENTICAL HLO, so the sig must join the key
            key = hashlib.sha256(
                lowered.as_text().encode() + b"\0" + sig.encode()
                + b"\0" + _backend_fingerprint()).hexdigest()
            path = os.path.join(_DIR, f"{self._name}-{key[:32]}.jexe")
            _record_usage(path)
            fut = _preload.pop(path, None)
            if fut is not None:
                # demand jumps the queue: a future still WAITING behind
                # unrelated queued loads is cancelled and loaded inline;
                # one already running is worth waiting for
                if not fut.done() and fut.cancel():
                    fut = None
            if fut is not None:
                try:
                    exe = fut.result()
                    _debug(f"exe_cache PRELOAD-HIT {self._name}-{key[:32]}")
                    return exe
                except Exception:
                    pass             # fall through to the normal load
            if os.path.exists(path) and _dir_trusted():
                with open(path, "rb") as f:
                    payload = pickle.load(f)
                exe = se.deserialize_and_load(*payload)
                _debug(f"exe_cache HIT {self._name}-{key[:32]}")
                return exe
            compiled = lowered.compile()
            # first execution forces the deferred backend compile; only a
            # post-execution serialize captures the compiled binary.
            # (block_until_ready does NOT synchronize through the axon
            # tunnel — a D2H fetch does.)
            out = compiled(*args, **self._dyn_kwargs(kwargs))
            for leaf in jax.tree_util.tree_leaves(out):
                if hasattr(leaf, "ravel"):
                    jax.device_get(leaf.ravel()[0:1])
                    break
            payload = se.serialize(compiled)
            with _lock:
                os.makedirs(_DIR, mode=0o700, exist_ok=True)
                tmp = f"{path}.tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    pickle.dump(payload, f)
                os.replace(tmp, path)
            _debug(f"exe_cache WROTE {self._name}-{key[:32]}")
            return compiled
        except Exception as e:       # never break compute over caching
            _debug(f"exe_cache FALLBACK {self._name}: "
                   f"{type(e).__name__}: {e}")
            return False


def cached_jit(fn=None, *, static_argnames=None, name=None):
    """Drop-in replacement for jax.jit with executable persistence."""
    if fn is None:
        return lambda f: CachedJit(f, static_argnames, name)
    return CachedJit(fn, static_argnames, name)


# -- threaded preload ---------------------------------------------------------
#
# Loads stream ~50 MB/s serially through the tunnel (executables are
# 200-550 MB; a full prove's working set is GBs), but threads overlap the
# transfers ~2.5x. Which executables a process will need can't be computed
# up front (keys require lowering), so each process APPENDS the paths it
# touches to a per-mode usage file; the next same-mode process preloads
# exactly that set in background threads while imports/tracing proceed.
# scripts/prewarm.py populates the usage files as a side effect.

_preload = {}
_usage_fh = None


def _mode_tag() -> str:
    return ("k" + os.environ.get("CURDLE_RNS_KERNEL", "0")
            + "v" + os.environ.get("CURDLE_VERIFY_KERNEL", "0"))


def _record_usage(path: str) -> None:
    global _usage_fh
    try:
        if _usage_fh is None:
            os.makedirs(_DIR, mode=0o700, exist_ok=True)
            _usage_fh = open(
                os.path.join(_DIR, f"usage-{_mode_tag()}.txt"), "a")
        _usage_fh.write(path + "\n")
        _usage_fh.flush()
    except OSError:
        pass


def preload_all(max_workers: int = 4) -> int:
    """Start background deserialization of every executable this mode's
    usage file names. Returns the number of loads started. Safe no-op when
    the cache is disabled/untrusted or no usage has been recorded."""
    if not _enabled() or not _dir_trusted():
        return 0
    try:
        with open(os.path.join(_DIR, f"usage-{_mode_tag()}.txt")) as f:
            paths = [p for p in dict.fromkeys(f.read().split())
                     if os.path.exists(p)]
    except OSError:
        return 0
    if not paths:
        return 0
    from concurrent.futures import ThreadPoolExecutor

    from jax.experimental import serialize_executable as se

    def load(p):
        with open(p, "rb") as f:
            payload = pickle.load(f)
        return se.deserialize_and_load(*payload)

    ex = ThreadPoolExecutor(max_workers)
    for p in paths:
        _preload[p] = ex.submit(load, p)
    ex.shutdown(wait=False)
    _debug(f"exe_cache preloading {len(paths)} executables")
    return len(paths)


def preload_join() -> None:
    """Block until every outstanding preload finishes. Benchmarks call
    this before a timed section — background loads share the tunnel with
    D2H fetches and would otherwise perturb measured latencies."""
    for fut in list(_preload.values()):
        try:
            fut.result()
        except Exception:
            pass
