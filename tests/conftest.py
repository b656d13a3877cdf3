"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the driver validates the real
multi-chip path separately via __graft_entry__.dryrun_multichip)."""

import os

# FORCE cpu: the environment's sitecustomize registers the axon TPU
# plugin and overrides platform selection programmatically, so neither
# the env var nor a setdefault works — only a config.update after import
# does.  Without this the whole suite silently runs single-device on the
# TPU tunnel and every mesh test degrades to 1 device.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent XLA compilation cache: cache hits make repeated suite
    # runs fast
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
