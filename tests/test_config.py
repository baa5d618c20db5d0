"""FedGANConfig construction-time validation (core/config.py __post_init__)."""
import pytest

from cglgan_tpu.core.config import FedGANConfig

pytestmark = pytest.mark.smoke


def cfg(**kw):
    base = dict(algo="capgan", dataset="2dmg", num_workers=4, num_class=5,
                num_sample=200, batch_size=32)
    base.update(kw)
    return FedGANConfig(**base)


class TestConfigGuards:
    def test_bf16_2dmg_refused(self):
        """bfloat16 + 2DMG is a measured fidelity loss (PERF.md: DS 0.03
        vs 0.91 f32 at 8k rounds) — refused at construction, with the
        numbers in the error, so library callers can't silently run it."""
        with pytest.raises(ValueError, match="0.03 vs 0.91"):
            cfg(dtype="bfloat16")

    def test_bf16_2dmg_forced(self):
        assert cfg(dtype="bfloat16", force_dtype=True).dtype == "bfloat16"

    def test_bf16_image_allowed(self):
        assert cfg(dataset="synthetic-mnist",
                   dtype="bfloat16").dtype == "bfloat16"

    def test_gossip_validated(self):
        with pytest.raises(ValueError, match="gossip"):
            cfg(gossip="bogus")
        assert cfg(gossip="delta").gossip == "delta"

    def test_divisibility(self):
        with pytest.raises(ValueError, match="divisible"):
            cfg(num_workers=5, num_servers=2)

    def test_cgl_family_rejects_dropout(self):
        with pytest.raises(ValueError, match="CGL"):
            cfg(algo="cglgan", num_servers=2, dropout_rate=0.1)
