"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

# persistent XLA compilation cache: the CPU backend here compiles some
# scans slowly; cache hits make repeated suite runs fast
try:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

REFERENCE = "/root/reference"
GOLDEN = os.path.join(os.path.dirname(__file__), "golden")

PACKAGES = {
    "en": "PHN_EN_TIMIT_LCRC_N500",
    "cz": "PHN_CZ_SPDAT_LCRC_N1500",
    "hu": "PHN_HU_SPDAT_LCRC_N1500",
    "ru": "PHN_RU_SPDAT_LCRC_N1500",
    "es": "test/PHN_ES",
}


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference tree not available")
    return REFERENCE


def package_dir(lang: str) -> str:
    return os.path.join(REFERENCE, PACKAGES[lang])


def golden(name: str) -> str:
    return os.path.join(GOLDEN, name)
