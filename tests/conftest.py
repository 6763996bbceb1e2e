import os
import subprocess
import sys
from pathlib import Path

# Force a deterministic 8-device CPU mesh for all tests: sharding/pjit logic is
# exercised without TPU hardware (the driver dry-runs the multichip path the
# same way), and numerics are integer so CPU == TPU bit-for-bit.
#
# This environment boots with an `axon` TPU plugin registered from
# sitecustomize (remote-tunneled chip; slow remote compiles), so forcing CPU
# must happen via jax.config *after* import, not just via JAX_PLATFORMS.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: cache-loaded executables skip XLA CPU
# compilation entirely, which both cuts suite wall time and widens the
# margin on the cumulative-compile SIGABRT (the per-module clear_caches
# below).  Must be set via jax.config — sitecustomize imports jax before
# this file runs, so the env var alone is ignored (llcomp_tpu/_env.py).
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp"),
)

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE = Path("/root/reference")


def make_photo(h, w, c=3, seed=42, noise=3):
    """Smooth 2-D gradient + small uniform noise — the BASELINE.md test signal."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 64 * np.sin(2 * np.pi * xx / max(w, 1) * 1.5)
        + 64 * np.cos(2 * np.pi * yy / max(h, 1) * 1.1)
    )
    img = base[..., None] + np.arange(c)[None, None, :] * 10.0
    img = img + rng.integers(-noise, noise + 1, size=(h, w, c))
    return np.clip(img, 0, 255).astype(np.uint8)


def make_noise(h, w, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables_between_modules():
    """Release XLA CPU executables at module boundaries.

    The full suite compiles several hundred programs into one process; past
    ~150 tests the CPU backend dies (SIGABRT/SIGSEGV, no message) inside
    ``backend_compile_and_load`` on the next large compile — deterministic
    at the same test, independent of the native runtime (reproduced with
    LLCT_NO_NATIVE=1), and absent in any subset run.  Dropping the jit
    caches between modules keeps accumulated compiler state under the
    threshold; cross-module recompiles cost ~1 min over the whole suite.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def photo_64():
    return make_photo(64, 64)


@pytest.fixture(scope="session")
def ref_oracle(tmp_path_factory):
    """Build the C++ reference as a conformance oracle, if available.

    The only modification is the output-buffer size (the reference overflows on
    tiny/incompressible images, SURVEY §2.9); that cannot change emitted bytes.
    Tests using this fixture are skipped when the reference isn't present.
    """
    if not (REFERENCE / "llcomp.hpp").exists():
        pytest.skip("reference source not available")
    d = tmp_path_factory.mktemp("refbuild")
    patched = d / "llcomp_patched.hpp"
    src = (REFERENCE / "llcomp.hpp").read_text()
    src = src.replace(
        "std::vector<uint8_t> buffer(size);",
        "std::vector<uint8_t> buffer(size + size / 2 + 4096);",
    )
    patched.write_text(src)
    main = d / "main.cpp"
    main.write_text(
        '#include "llcomp_patched.hpp"\n'
        "#include <cstdio>\n#include <cstdlib>\n#include <vector>\n"
        "int main(int argc, char** argv) {\n"
        "  std::vector<uint8_t> in; uint8_t buf[65536]; size_t n;\n"
        "  while ((n = fread(buf, 1, sizeof buf, stdin)) > 0) in.insert(in.end(), buf, buf+n);\n"
        "  if (argv[1][0] == 'c') {\n"
        "    auto out = llcomp::compressImage(in, atoi(argv[2]), atoi(argv[3]), atoi(argv[4]));\n"
        "    fwrite(out.data(), 1, out.size(), stdout);\n"
        "  } else {\n"
        "    auto img = llcomp::decompressImage(in);\n"
        "    fwrite(img.pixels.data(), 1, img.pixels.size(), stdout);\n"
        "  }\n  return 0;\n}\n"
    )
    exe = d / "ref_oracle"
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-DNDEBUG", "-o", str(exe), str(main)],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        pytest.skip("cannot build reference oracle")

    class Ref:
        def encode(self, img):
            img = np.asarray(img, dtype=np.uint8)
            h, w, c = img.shape
            r = subprocess.run(
                [str(exe), "c", str(w), str(h), str(c)],
                input=img.tobytes(), capture_output=True, check=True,
            )
            return r.stdout

        def decode(self, data, shape):
            r = subprocess.run([str(exe), "d"], input=bytes(data), capture_output=True, check=True)
            return np.frombuffer(r.stdout, dtype=np.uint8).reshape(shape)

    return Ref()
