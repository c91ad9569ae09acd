"""Golden-output pin for the augmentation tiers.

ADVICE r4 flagged that a refactor of the augmentation internals (there,
composing the heavy-tier geometry into the pre-photometric warp) can
silently change the augmentation *distribution* while every structural
test stays green — shifting downstream accuracy numbers that parity
claims cite. This suite pins the exact outputs of `augment_batch` for
fixed inputs/keys per tier at two image sizes, so any future change to
the sampled distribution is a visible, deliberate fixture regeneration
rather than a silent drift.

Upstream analogue: the reference pins its albumentations pipelines by
construction (data/datasets.py builds fixed Compose lists); since ours
re-derives those ops TPU-first (one composed warp per geometry block +
fused photometrics), the output pin is the equivalent guarantee.

Backend note: the fixture is generated on CPU (the jnp warp fallback);
TPU runs take the Pallas lane-gather warp, whose equality with the
fallback is covered separately by tests/test_warp_kernel.py. Regenerate
with `python tests/test_augment_golden.py --regen` after any deliberate
distribution change, and re-validate the accuracy claims in PARITY.md.
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nnue_vision_tpu.data.augment import augment_batch

FIXTURE = Path(__file__).parent / "fixtures" / "augment_golden_r5.npz"
SIZES = (16, 32)
TIERS = ("light", "medium", "heavy")
SEEDS = (0, 7)


def _generate():
    rng = np.random.default_rng(20260819)
    out = {}
    for size in SIZES:
        imgs = rng.random((8, size, size, 3)).astype(np.float32)
        out[f"images_{size}"] = imgs
        for tier in TIERS:
            for seed in SEEDS:
                out[f"aug_{size}_{tier}_{seed}"] = np.asarray(
                    augment_batch(
                        jax.random.PRNGKey(seed), jnp.asarray(imgs),
                        strength=tier,
                    )
                )
    return out


@pytest.fixture(scope="module")
def golden():
    assert FIXTURE.exists(), (
        f"{FIXTURE} missing — regenerate with "
        "`python tests/test_augment_golden.py --regen`"
    )
    return np.load(FIXTURE)


@pytest.mark.parametrize("size", SIZES)
@pytest.mark.parametrize("tier", TIERS)
@pytest.mark.parametrize("seed", SEEDS)
def test_augment_matches_golden(golden, size, tier, seed):
    imgs = jnp.asarray(golden[f"images_{size}"])
    got = np.asarray(augment_batch(jax.random.PRNGKey(seed), imgs,
                                   strength=tier))
    want = golden[f"aug_{size}_{tier}_{seed}"]
    # float32 elementwise chains reassociate across XLA versions; 1e-5
    # catches any distribution change (real drifts measured ≥2.7e-2)
    # without pinning ULP-level compiler noise.
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5,
                               err_msg=f"{size}px {tier} seed={seed}")


def test_golden_fixture_is_complete(golden):
    want_keys = {f"images_{s}" for s in SIZES} | {
        f"aug_{s}_{t}_{k}" for s in SIZES for t in TIERS for k in SEEDS
    }
    assert set(golden.files) == want_keys


if __name__ == "__main__":
    import sys

    if "--regen" in sys.argv:
        data = _generate()
        np.savez_compressed(FIXTURE, **data)
        print(f"regenerated {FIXTURE} ({len(data)} arrays)")
    else:
        print(__doc__)
