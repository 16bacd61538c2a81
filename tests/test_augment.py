"""Train-time augmentation tests (ops/augment.py) — the reference's
RandomAffine(30, shear=15) + ColorJitter(0.2, 0.2)
(findings_classifier/chexpert_dataset.py:47-52)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from radialog_tpu.ops.augment import (affine_params, augment_cxr,
                                      augment_cxr_batch, color_jitter,
                                      _inverse_rss, random_affine)

K = jax.random.PRNGKey(0)


def _img(h=32, w=32, c=3, seed=0):
    return jnp.asarray(np.random.default_rng(seed).random((h, w, c)),
                       jnp.float32)


class TestRandomAffine:
    def test_param_ranges(self):
        angles, shears = [], []
        for i in range(200):
            a, s = affine_params(jax.random.PRNGKey(i))
            angles.append(float(a))
            shears.append(float(s))
        assert all(-30 <= a <= 30 for a in angles)
        assert all(-15 <= s <= 15 for s in shears)
        # actually spans the range (not collapsed)
        assert max(angles) > 15 and min(angles) < -15

    def test_identity_matrix_at_zero(self):
        m = np.asarray(_inverse_rss(jnp.float32(0.0), jnp.float32(0.0)))
        np.testing.assert_allclose(m, np.eye(2), atol=1e-6)

    def test_zero_degrees_is_identity(self):
        img = _img()
        out = random_affine(img, K, degrees=0.0, shear=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_deterministic_under_fixed_key(self):
        img = _img()
        a = random_affine(img, K)
        b = random_affine(img, K)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_rotation_preserves_pixel_set_nearest(self):
        # NEAREST resampling never invents values: every output pixel is
        # either an input pixel or the fill value
        img = _img(16, 16, 1)
        out = np.asarray(random_affine(img, jax.random.PRNGKey(3)))
        vals = set(np.round(np.asarray(img).ravel(), 6))
        vals.add(0.0)
        assert set(np.round(out.ravel(), 6)) <= vals

    def test_inverse_matrix_roundtrip(self):
        # forward RSS @ inverse == identity for sampled params
        for i in range(5):
            a, s = affine_params(jax.random.PRNGKey(i))
            r, sx = np.deg2rad(float(a)), np.deg2rad(float(s))
            fwd = np.array([[np.cos(r), -np.cos(r) * np.tan(sx) - np.sin(r)],
                            [np.sin(r), -np.sin(r) * np.tan(sx) + np.cos(r)]])
            inv = np.asarray(_inverse_rss(a, s))
            np.testing.assert_allclose(fwd @ inv, np.eye(2), atol=1e-5)


class TestColorJitter:
    def test_output_in_range(self):
        img = _img()
        for i in range(10):
            out = np.asarray(color_jitter(img, jax.random.PRNGKey(i)))
            assert out.min() >= 0.0 and out.max() <= 1.0

    def test_deterministic_under_fixed_key(self):
        img = _img()
        a = color_jitter(img, K)
        b = color_jitter(img, K)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_zero_strength_is_identity(self):
        img = _img()
        out = color_jitter(img, K, brightness=0.0, contrast=0.0)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    def test_brightness_scales_mean(self):
        # contrast off: output = clip(b*img), so mean scales by the factor
        img = _img() * 0.5  # keep below clip
        out = np.asarray(color_jitter(img, jax.random.PRNGKey(7), contrast=0.0))
        ratio = out.mean() / float(np.asarray(img).mean())
        assert 0.8 - 1e-3 <= ratio <= 1.2 + 1e-3


class TestComposite:
    def test_batch_varies_per_image(self):
        imgs = jnp.stack([_img(seed=0), _img(seed=0)])  # identical images
        out = np.asarray(augment_cxr_batch(imgs, K))
        assert not np.allclose(out[0], out[1])  # per-image subkeys

    def test_batch_deterministic(self):
        imgs = jnp.stack([_img(seed=0), _img(seed=1)])
        a = np.asarray(augment_cxr_batch(imgs, K))
        b = np.asarray(augment_cxr_batch(imgs, K))
        np.testing.assert_array_equal(a, b)

    def test_jittable_inside_step(self):
        img = _img()

        @jax.jit
        def f(im, k):
            return augment_cxr(im, k)

        out = f(img, K)
        assert out.shape == img.shape and out.dtype == img.dtype


def _raw_step_setup():
    """Shared (compile-once) fixture for the raw stage-1 step tests: tiny
    basic-block trunk keeps the CPU grad-graph compile small."""
    import optax
    from radialog_tpu.models.biovil_t import biovil_t_init
    from radialog_tpu.models.blip2 import Blip2Config, blip2_init
    from radialog_tpu.models.qformer import TINY_QFORMER
    from radialog_tpu.train.steps import TrainState, make_stage1_raw_train_step

    bcfg = Blip2Config(qformer=TINY_QFORMER, max_txt_len=16)
    kv, kb = jax.random.split(jax.random.PRNGKey(0))
    vparams, vstate = biovil_t_init(
        kv, joint_feature_size=TINY_QFORMER.encoder_width,
        resnet_layers=(1, 1, 1, 1), bottleneck=False)
    params, _ = blip2_init(kb, bcfg, with_vision=False)
    tx = optax.sgd(1e-3)
    state = TrainState.create(params, tx)
    step_plain = jax.jit(make_stage1_raw_train_step(tx, bcfg, augment=False))
    step_aug = jax.jit(make_stage1_raw_train_step(tx, bcfg, augment=True))
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32),
        "text_ids": jnp.asarray(rng.integers(4, 120, (2, 8)), jnp.int32),
        "text_mask": jnp.ones((2, 8), jnp.int32),
    }
    return state, vparams, vstate, step_plain, step_aug, batch


_RAW_CACHE = []


def _raw():
    if not _RAW_CACHE:
        _RAW_CACHE.append(_raw_step_setup())
    return _RAW_CACHE[0]


class TestStage1RawStep:
    """make_stage1_raw_train_step: frozen trunk inside jit, trainable
    ln_vision, optional on-device augs."""

    @pytest.mark.slow
    def test_step_runs_and_loss_finite(self):
        state, vp, vs, step, _, batch = _raw()
        new_state, metrics = step(state, vp, vs, batch, K)
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1

    @pytest.mark.slow
    def test_frozen_trunk_but_trainable_ln_vision(self):
        state, vp, vs, step, _, batch = _raw()
        new_state, _ = step(state, vp, vs, batch, K)
        # ln_vision received a gradient (reference: only visual_encoder is
        # frozen, blip2_qformer.py:66-71)
        before = np.asarray(state.params["ln_vision"]["scale"])
        after = np.asarray(new_state.params["ln_vision"]["scale"])
        assert not np.allclose(before, after)
        # the visual trunk is NOT in the optimizer tree at all
        assert "visual" not in state.params

    @pytest.mark.slow
    def test_augmented_step_changes_loss(self):
        state, vp, vs, step_plain, step_aug, batch = _raw()
        _, m_plain = step_plain(state, vp, vs, batch, K)
        _, m_aug = step_aug(state, vp, vs, batch, K)
        assert np.isfinite(float(m_aug["loss"]))
        assert abs(float(m_aug["loss"]) - float(m_plain["loss"])) > 1e-8


class TestClassifierStepAugSignature:
    def test_augment_flag_adds_rng_arg(self):
        import inspect
        import optax
        from radialog_tpu.train.classifier import make_classifier_train_step
        step_plain = make_classifier_train_step(optax.sgd(1e-3))
        step_aug = make_classifier_train_step(optax.sgd(1e-3), augment=True)
        assert len(inspect.signature(step_plain).parameters) == 3
        assert len(inspect.signature(step_aug).parameters) == 4
