"""AOT executable cache: skip the Python *trace*, not just the compile.

The persistent XLA compile cache (`utils.compile_cache`) removes the
backend-compile cost of a warm start, but every process still re-pays the
JAX trace of the fully-unrolled kernels — ~250 s of pure Python for the
128-mesh triangle step (403k traced pjit calls, measured by cProfile;
benchmarks/PROFILE.md "Round-4: cold start"). This module pickles the
fully-compiled executable via `jax.experimental.serialize_executable`
(supported by the axon TPU plugin — verified) so a warm process skips the
trace too: bench triangle stage 5m24s -> 12.3 s measured on the
tunnel-attached v5e.

Keying: package-source digest + config/scene/lights digests supplied by
the call site + platform/device kind + jax version + the concrete arg
avals of the first call. Any load/serialize failure falls back to the
plain jitted function (the cache is an accelerator, never a correctness
dependency). Kill switch: ``L2N_AOT_CACHE=0``; default policy is
TPU-only (CPU test runs would pay serialize cost for nothing and the
XLA:CPU executables refuse to load across machine-feature changes) —
``L2N_AOT_CACHE=1`` forces it on everywhere.

The reference has no analog (GL shader binaries are cached by the GL
driver, main.cpp's compileProgram re-links per run); this is TPU
operational machinery.
"""

from __future__ import annotations

import dataclasses
import hashlib
import os
import pickle
import sys
import tempfile

import numpy as np

DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..",
                           ".aot_cache")

# Modules that can change the TRACED PROGRAM of a cached executable: the
# kernels and everything they call at trace time (ops/maths/render/rng),
# the scene builders (their code paths — e.g. spheres_disjoint,
# detect_lat_long_spheres — steer kernel codegen beyond the hashed scene
# arrays), the camera row layout (ROW_* constants are baked into traces)
# and the config. Host-only tiers — app/ (UI), utils/ (this cache, IO,
# profiling), parallel/ (the sharded step builds its own jit and never
# AOT-caches), native/ (the C++ reference renderer) — are deliberately
# EXCLUDED: digesting every package .py (the round-4 scheme) meant a
# docs-adjacent app edit forced a ~15-minute triangle re-warm (VERDICT r4
# weak #2 / next #6). Guarded by tests/test_aot_cache.py, which fails if
# a trace-relevant module ever falls outside this list.
TRACE_RELEVANT_DIRS = ("ops", "maths", "render", "rng", "scene", "camera")
TRACE_RELEVANT_FILES = ("config.py",)

_SRC_DIGEST: str | None = None


def _mode() -> str:
    return os.environ.get("L2N_AOT_CACHE", "tpu")  # "0" | "1" | "tpu"


def _log(msg: str) -> None:
    print(f"[aot_cache] {msg}", file=sys.stderr, flush=True)


def digest_files() -> list[str]:
    """The package .py files whose content keys every cached executable:
    the trace-relevant modules (TRACE_RELEVANT_DIRS/_FILES), package-
    relative, deterministically ordered."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = []
    for d in TRACE_RELEVANT_DIRS:
        for root, dirs, files in os.walk(os.path.join(pkg, d)):
            dirs.sort()  # steers os.walk: deterministic traversal order
            for f in sorted(files):
                if f.endswith(".py"):
                    out.append(os.path.relpath(os.path.join(root, f), pkg))
    out.extend(f for f in TRACE_RELEVANT_FILES
               if os.path.exists(os.path.join(pkg, f)))
    return out


def source_digest() -> str:
    """Digest of the trace-relevant package sources (any change to code
    that can alter a traced program invalidates every entry — executables
    bake the traced program in; host-only tiers are excluded, see
    TRACE_RELEVANT_DIRS)."""
    global _SRC_DIGEST
    if _SRC_DIGEST is None:
        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for rel in digest_files():
            h.update(rel.encode())
            with open(os.path.join(pkg, rel), "rb") as fh:
                h.update(fh.read())
        _SRC_DIGEST = h.hexdigest()
    return _SRC_DIGEST


def _update(h, obj) -> None:
    """Recursive structural hash: numpy/jax arrays by content, scalars and
    strings by repr, containers element-wise. Device arrays are pulled —
    call sites keep keys host-side (scene buffers are host numpy)."""
    if obj is None or isinstance(obj, (bool, int, float, str, bytes)):
        h.update(repr(obj).encode())
    elif isinstance(obj, np.ndarray):
        h.update(f"nd{obj.shape}{obj.dtype}".encode())
        h.update(np.ascontiguousarray(obj).tobytes())
    elif isinstance(obj, (tuple, list)):
        h.update(f"seq{len(obj)}".encode())
        for x in obj:
            _update(h, x)
    elif isinstance(obj, dict):
        h.update(f"map{len(obj)}".encode())
        for k in sorted(obj):
            _update(h, k)
            _update(h, obj[k])
    elif dataclasses.is_dataclass(obj):
        h.update(type(obj).__name__.encode())
        for f in dataclasses.fields(obj):
            _update(h, f.name)
            _update(h, getattr(obj, f.name))
    else:
        # jax arrays and anything array-like: content hash via numpy, with
        # the same tag as the ndarray branch (a host copy of a device
        # array must produce the same key).
        arr = np.asarray(obj)
        h.update(f"nd{arr.shape}{arr.dtype}".encode())
        h.update(np.ascontiguousarray(arr).tobytes())


def digest(*parts) -> str:
    h = hashlib.sha256()
    for p in parts:
        _update(h, p)
    return h.hexdigest()


def _avals(args):
    import jax
    return jax.tree.map(
        lambda x: f"{np.shape(x)}:{np.result_type(x)}", args)


def aot_jit(fn, *, name: str, key_parts=(), donate_argnums=(),
            cache_dir: str | None = None):
    """jax.jit with a disk-backed executable cache.

    Returns a callable with jit semantics for a SINGLE arg signature (the
    first call's); our step functions are monomorphic by construction
    (static shapes are the TPU contract). On the first call it loads a
    serialized executable if the key matches, else traces + compiles +
    serializes. Every failure path degrades to the plain jitted callable.
    """
    import jax

    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    mode = _mode()
    if mode == "0":
        return jitted

    state: dict = {}

    def resolve(args):
        """-> (callable, loaded_from_disk)."""
        if mode != "1" and jax.default_backend() != "tpu":
            return jitted, False
        dev = jax.devices()[0]
        key = digest(name, source_digest(), jax.__version__, dev.platform,
                     getattr(dev, "device_kind", ""), repr(donate_argnums),
                     _avals(args), *key_parts)
        path = os.path.abspath(os.path.join(
            cache_dir or os.environ.get("L2N_AOT_CACHE_DIR", DEFAULT_DIR),
            f"{name}-{key[:24]}.aotc"))
        from jax.experimental import serialize_executable as se
        if os.path.exists(path):
            try:
                with open(path, "rb") as fh:
                    payload = pickle.load(fh)
                compiled = se.deserialize_and_load(*payload)
                _log(f"loaded {name} executable ({path})")
                return compiled, True
            except Exception as e:  # stale/foreign entry: recompile
                _log(f"load failed for {name} ({type(e).__name__}: {e}); "
                     "recompiling")
        try:
            compiled = jitted.lower(*args).compile()
        except Exception as e:
            _log(f"AOT lower/compile failed for {name} "
                 f"({type(e).__name__}: {e}); plain jit")
            return jitted, False
        try:
            payload = se.serialize(compiled)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path))
            with os.fdopen(fd, "wb") as fh:
                pickle.dump(payload, fh)
            os.replace(tmp, path)
            _log(f"serialized {name} executable ({path})")
        except Exception as e:
            _log(f"serialize failed for {name} ({type(e).__name__}: {e}); "
                 "executable not cached")
        return compiled, False

    def wrapper(*args):
        compiled = state.get("compiled")
        if compiled is None:
            compiled, loaded = resolve(args)
            if loaded:
                # A deserialized executable can still fail at EXECUTION
                # time (device-topology mismatch the load did not reject,
                # e.g. a 1-chip entry under a forced multi-device client).
                # Sync before pinning it so asynchronously-surfacing
                # failures are caught HERE (one extra RTT, once per
                # process) instead of at an arbitrary later step with the
                # bad executable already cached. The common failure (the
                # input handler's rejection) raises before any donation;
                # if a post-donation failure already deleted the donated
                # inputs, the plain-jit retry below cannot run either —
                # re-raise the original error rather than masking it with
                # an 'Array has been deleted' message.
                try:
                    out = compiled(*args)
                    import jax as _jax
                    _jax.block_until_ready(out)
                except Exception as e:
                    _log(f"loaded {name} executable failed to run "
                         f"({type(e).__name__}: {e}); plain jit")
                    state["compiled"] = jitted
                    try:
                        return jitted(*args)
                    except Exception:
                        raise e
                state["compiled"] = compiled
                return out
            state["compiled"] = compiled
        return compiled(*args)

    return wrapper
