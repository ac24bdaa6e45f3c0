"""Optional C acceleration for the three hot signature kernels.

The MinHash fold dominates signature time (~68% measured: 128
multiply-shift ops per shingle, ~1.1G uint64 mul/add/shift/min per 2k-doc
batch); numpy streams it at ~320M ops/s where a `-march=native` C loop
(AVX-512DQ has the 64-bit vector multiply) runs ~15x faster on this host.
The C source below is compiled ON THE EXECUTING HOST at first import with
the system cc — no prebuilt binaries, no pip — cached under the user cache
dir keyed by a hash of the source + compiler flags + CPU identity
(machine arch + /proc/cpuinfo feature flags — a shared NFS cache across
heterogeneous hosts must not hand an AVX-512 binary to a host without
AVX-512), loaded via ctypes.

Strictly an accelerator, never a semantic layer:
- every function is BIT-IDENTICAL to its numpy reference in kernels.py
  (uint64 wraparound is native in C; tests/test_kernels.py pins equality on
  random and adversarial inputs);
- any failure — no compiler, sandboxed cc, load error — silently yields
  LIB=None and kernels.py keeps the pure-numpy path;
- DEDUP_DISABLE_NATIVE=1 forces the numpy path (used by the identity
  tests to produce the reference, and the escape hatch in production).

Concurrency: Spark pandas-UDF workers import this module per process; the
compile writes to a temp file and os.replace()s it into the cache path, so
racing workers either reuse the finished .so or atomically install an
identical one. On a multi-host cluster each host compiles once; hosts
without a toolchain just run numpy.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import platform
import subprocess
import tempfile
from pathlib import Path

_CFLAGS = ["-O3", "-march=native", "-funroll-loops", "-shared", "-fPIC"]

_SRC = r"""
#include <stdint.h>

/* sig[j] = min over shingles s of (a[j]*s + b[j]) >> 32, uint64 wraparound.
   Perm-major: the inner reduction over shingles auto-vectorizes (min is a
   lane-wise reduction; AVX-512DQ supplies the 64-bit multiply). */
void minhash_fold(const uint64_t *sh, long n, const uint64_t *a,
                  const uint64_t *b, long m, uint64_t *out) {
    for (long j = 0; j < m; j++) {
        uint64_t aj = a[j], bj = b[j], acc = ~0ULL;
        for (long i = 0; i < n; i++) {
            uint64_t v = (aj * sh[i] + bj) >> 32;
            acc = v < acc ? v : acc;
        }
        out[j] = acc;
    }
}

static inline uint64_t mix64(uint64_t h) {
    h ^= h >> 30; h *= 0xBF58476D1CE4E5B9ULL;
    h ^= h >> 27; h *= 0x94D049BB133111EBULL;
    h ^= h >> 31; return h;
}

/* out[s] = mix64( sum_{j<k} data[s+j] * powers[k-1-j] ), s in [0, n-k].
   Same coefficient order as kernels.char_shingle_hashes /
   gram_hashes_positional (powers = _poly_powers(k), reversed in the dot). */
void window_hashes(const uint8_t *data, long n, long k,
                   const uint64_t *powers, uint64_t *out) {
    for (long s = 0; s + k <= n; s++) {
        uint64_t h = 0;
        for (long j = 0; j < k; j++) h += (uint64_t)data[s + j] * powers[k - 1 - j];
        out[s] = mix64(h);
    }
}

/* Majority vote per bit; bit set iff 2*count >= n (kernels.simhash64 tie
   rule). Input is the (deduped) shingle-hash set. */
uint64_t simhash64(const uint64_t *sh, long n) {
    long cnt[64] = {0};
    for (long i = 0; i < n; i++) {
        uint64_t s = sh[i];
        for (int bit = 0; bit < 64; bit++) cnt[bit] += (s >> bit) & 1ULL;
    }
    uint64_t out = 0;
    for (int bit = 0; bit < 64; bit++)
        if (2 * cnt[bit] >= n) out |= 1ULL << bit;
    return out;
}
"""


def _cpu_identity() -> str:
    """CPU identity folded into the cache key. `-march=native` binaries are
    host-ISA-specific; on a cluster with a shared (NFS) home, a worker on a
    CPU lacking the compiling host's extensions (e.g. AVX-512) must NOT
    load the cached .so — it would SIGILL at call time, past any
    try/except. Keying by the ISA feature flags makes each CPU flavor
    compile (and reuse) its own artifact."""
    ident = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    ident += " " + " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # non-Linux: fall back to processor string
        ident += " " + platform.processor()
    return ident


def _build() -> "ctypes.CDLL | None":
    if os.environ.get("DEDUP_DISABLE_NATIVE"):
        return None
    key = hashlib.sha256(
        (" ".join(_CFLAGS) + _SRC + "\n" + _cpu_identity()).encode()
    ).hexdigest()[:16]
    cache_dir = Path(
        os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache")
    ) / "dedup-native"
    so_path = cache_dir / f"kernels-{key}.so"
    if not so_path.exists():
        cache_dir.mkdir(parents=True, exist_ok=True)
        with tempfile.TemporaryDirectory(dir=cache_dir) as td:
            c_path = Path(td) / "kernels.c"
            c_path.write_text(_SRC)
            tmp_so = Path(td) / "kernels.so"
            subprocess.run(
                ["cc", *_CFLAGS, "-o", str(tmp_so), str(c_path)],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp_so, so_path)  # atomic under racing workers
    lib = ctypes.CDLL(str(so_path))
    lib.minhash_fold.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_long, ctypes.c_void_p,
    ]
    lib.minhash_fold.restype = None
    lib.window_hashes.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.window_hashes.restype = None
    lib.simhash64.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.simhash64.restype = ctypes.c_uint64
    return lib


try:
    LIB = _build()
except Exception:  # no cc / sandbox / exotic platform -> pure numpy
    LIB = None
