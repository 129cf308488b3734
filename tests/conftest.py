import os
import warnings

# Multi-device CPU mesh for sharding tests; must be set before jax import.
# The harness exports JAX_PLATFORMS=axon, and running the suite over the
# remote-TPU relay (~25 ms/dispatch) makes it crawl, so the relay platform is
# redirected to the virtual 8-device CPU mesh; on-chip validation is a
# separate manual pass (PARITY.md "Hardware validation").  An explicitly
# requested platform is honored: KART_TEST_PLATFORM=tpu (or any value) keeps
# the suite on that platform.
_TEST_PLATFORM = os.environ.get("KART_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _TEST_PLATFORM
# The axon sitecustomize imports jax at interpreter boot (before conftest),
# which latches JAX_PLATFORMS=axon from the harness env — the env write
# above is then too late.  jax.config.update still works as long as no
# backend has been initialized, which is the case at collection time.
try:
    import jax

    jax.config.update("jax_platforms", _TEST_PLATFORM)
except Exception as e:  # pragma: no cover - only when a backend pre-initialized
    warnings.warn(f"could not repoint jax platform to {_TEST_PLATFORM!r}: {e}")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


def pytest_configure(config):
    """Fail loudly if the platform override did not take (ADVICE r2)."""
    if _TEST_PLATFORM != "cpu":
        return  # deliberate non-cpu run: whatever jax picks is intended
    import jax

    if jax.default_backend() != "cpu":
        warnings.warn(
            f"jax backend is {jax.default_backend()!r}, not 'cpu': the suite "
            "will run over the device relay (slow) with the wrong topology"
        )
    elif len(jax.devices()) != 8:
        warnings.warn(
            f"expected 8 virtual CPU devices, got {len(jax.devices())}: "
            "sharding tests may fail (XLA_FLAGS set too late?)"
        )

import subprocess
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
REFBUILD = REPO / ".refbuild"
WORK = Path(__file__).resolve().parent / "_work"


def have_reference() -> bool:
    return (REFBUILD / "bin" / "kart").exists() and (REFBUILD / "bin" / "bwt_index").exists()


needs_reference = pytest.mark.skipif(
    not have_reference(), reason="reference oracle binaries not built (.refbuild/bin)"
)


def make_genome(rng: np.random.Generator, chrom_lens, n_runs=0) -> str:
    """Random genome FASTA text with optional N runs."""
    out = []
    for i, L in enumerate(chrom_lens):
        seq = rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=L)
        for _ in range(n_runs):
            p = rng.integers(0, max(1, L - 20))
            seq[p : p + int(rng.integers(1, 15))] = ord("N")
        lines = [f">chr{i + 1} test sequence {i + 1}"]
        s = seq.tobytes().decode()
        lines += [s[j : j + 70] for j in range(0, len(s), 70)]
        out.append("\n".join(lines))
    return "\n".join(out) + "\n"


@pytest.fixture(scope="session")
def workdir():
    WORK.mkdir(parents=True, exist_ok=True)
    return WORK


@pytest.fixture(scope="session")
def small_genome(workdir):
    """A 100kb 2-chromosome genome with N holes, indexed by both the
    reference indexer (if available) and ours."""
    rng = np.random.default_rng(1234)
    fa = workdir / "small.fa"
    fa.write_text(make_genome(rng, [60000, 40000], n_runs=3))
    return fa


def run_reference_indexer(fa: Path, prefix: Path):
    subprocess.run(
        [str(REFBUILD / "bin" / "bwt_index"), str(fa), str(prefix)],
        check=True,
        capture_output=True,
    )


def run_reference_kart(args: list[str]):
    return subprocess.run(
        [str(REFBUILD / "bin" / "kart")] + args, check=True, capture_output=True
    )
