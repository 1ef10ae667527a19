"""Model shape/contract tests (SURVEY.md §2 C4-C8 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dmel_tpu import models, ops


def init_and_apply(model, x, train=False, rngs=None):
    variables = model.init(jax.random.PRNGKey(0), x)
    extra = {}
    if train:
        extra["rngs"] = {"dropout": jax.random.PRNGKey(1),
                         "augment": jax.random.PRNGKey(2), **(rngs or {})}
        extra["mutable"] = ["batch_stats"]
    out = model.apply(variables, x, train=train, **extra)
    if train:
        out = out[0]
    return variables, out


class TestMelSpectrogramLayer:
    def test_output_shape_and_param(self):
        layer = models.MelSpectrogramLayer(
            init_lambd=6.38, n_mels=32, n_points=128, sample_rate=8000)
        x = jnp.zeros((4, 128))
        variables = layer.init(jax.random.PRNGKey(0), x)
        assert float(variables["params"]["lambd"]) == pytest.approx(6.38)
        out = layer.apply(variables, x)
        assert out.shape == (4, 1, 32, 129)

    def test_grad_flows_to_lambd(self, rng):
        layer = models.MelSpectrogramLayer(
            init_lambd=6.38, n_mels=16, n_points=128, sample_rate=8000)
        x = jnp.asarray(rng.standard_normal((2, 128)).astype(np.float32))
        variables = layer.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda v: layer.apply(v, x).sum())(variables)
        assert abs(float(g["params"]["lambd"])) > 0


class TestSpectrogramLayer:
    def test_output_shape(self):
        layer = models.SpectrogramLayer(init_lambd=6.38)
        x = jnp.ones((2, 128))
        variables = layer.init(jax.random.PRNGKey(0), x)
        out = layer.apply(variables, x)
        assert out.shape == (2, 1, 129, 129)


@pytest.mark.parametrize("name,cls", [
    ("mel_linear_net", models.MelLinearNet),
    ("mel_mlp_net", models.MelMlpNet),
    ("mel_conv_net", models.MelConvNet),
])
class TestMelClassifiers:
    def test_forward_contract(self, rng, name, cls):
        model = cls(n_classes=10, init_lambd=6.38, n_mels=16, n_points=128,
                    sample_rate=8000, hop_length=4, energy_normalize=True)
        x = jnp.asarray(rng.standard_normal((3, 128)).astype(np.float32))
        _, (logits, s) = init_and_apply(model, x)
        assert logits.shape == (3, 10)
        assert s.shape == (3, 1, 16, 33)
        # energy_normalize returns log-compressed s (can be negative)
        assert float(s.min()) < 0


@pytest.mark.parametrize("name,cls", [
    ("linear_net", models.LinearNet),
    ("mlp_net", models.MlpNet),
    ("conv_net", models.ConvNet),
])
class TestSpecClassifiers:
    def test_forward_contract(self, rng, name, cls):
        # reference convention: size=(n_points+1, n_points+1) with hop=1
        # (utils.py:159); the flattened fc expects exactly that image.
        model = cls(n_classes=3, init_lambd=6.38, size=(65, 65), hop_length=1)
        x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
        _, (logits, s) = init_and_apply(model, x)
        assert logits.shape == (2, 3)
        assert s.shape == (2, 1, 65, 65)


class TestBatchNormLinearNet:
    def test_train_updates_batch_stats(self, rng):
        model = models.BatchNormLinearNet(n_classes=3, init_lambd=6.38,
                                          size=(65, 65), hop_length=1)
        x = jnp.asarray(rng.standard_normal((2, 64)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert "batch_stats" in variables
        (logits, s), updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        assert logits.shape == (2, 3)
        old = variables["batch_stats"]["bn"]["mean"]
        new = updates["batch_stats"]["bn"]["mean"]
        assert float(jnp.abs(new - old).max()) > 0


class TestPANNs:
    def test_patches_conv_equivalent_to_stock(self, rng):
        """Round-5 block1 lever: the C_in=1 5x5 conv as an im2col GEMM
        must match nn.Conv exactly — same param name/shape/INIT VALUES
        (checkpoint + PANNs-import compatibility) and same math up to
        f32 reduction order (measured 24% on the esc50 step,
        results/diag_cnn6_r5b.txt)."""
        import flax.linen as nn

        from dmel_tpu.models.common import xavier_uniform
        from dmel_tpu.models.panns import Patches5x5Conv
        x = jnp.asarray(rng.standard_normal((2, 33, 16, 1))
                        .astype(np.float32))
        pc = Patches5x5Conv(8, (5, 5), padding="SAME", use_bias=False,
                            kernel_init=xavier_uniform())
        sc = nn.Conv(8, (5, 5), padding="SAME", use_bias=False,
                     kernel_init=xavier_uniform())
        vp = pc.init(jax.random.PRNGKey(0), x)
        vs = sc.init(jax.random.PRNGKey(0), x)
        for a, b in zip(jax.tree.leaves(vp), jax.tree.leaves(vs)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ya, yb = pc.apply(vp, x), sc.apply(vs, x)
        denom = float(jnp.max(jnp.abs(yb)))
        assert float(jnp.max(jnp.abs(ya - yb))) / denom < 1e-5
        ga = jax.grad(lambda v, xx: (pc.apply(v, xx) ** 2).sum(),
                      argnums=(0, 1))(vp, x)
        gb = jax.grad(lambda v, xx: (sc.apply(v, xx) ** 2).sum(),
                      argnums=(0, 1))(vs, x)
        for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
            d = float(jnp.max(jnp.abs(b))) + 1e-30
            assert float(jnp.max(jnp.abs(a - b))) / d < 1e-5
        # C_in > 1 falls back to the stock conv path
        x3 = jnp.asarray(rng.standard_normal((2, 9, 8, 3))
                         .astype(np.float32))
        v3 = pc.init(jax.random.PRNGKey(1), x3)
        assert pc.apply(v3, x3).shape == (2, 9, 8, 8)
        # 3x3 variant (Cnn14's first block rides the same path)
        pc3 = Patches5x5Conv(8, (3, 3), padding="SAME", use_bias=False,
                             kernel_init=xavier_uniform())
        sc3 = nn.Conv(8, (3, 3), padding="SAME", use_bias=False,
                      kernel_init=xavier_uniform())
        vp3 = pc3.init(jax.random.PRNGKey(2), x)
        vs3 = sc3.init(jax.random.PRNGKey(2), x)
        ya3, yb3 = pc3.apply(vp3, x), sc3.apply(vs3, x)
        d3 = float(jnp.max(jnp.abs(yb3)))
        assert float(jnp.max(jnp.abs(ya3 - yb3))) / d3 < 1e-5

    def test_cnn6_forward(self, rng):
        model = models.MelPANNsNet(
            n_classes=50, init_lambd=46.67, n_mels=64, n_points=4000,
            sample_rate=8000, hop_length=80, optimized=True,
            window_length=ops.optimized_window_length(46.67),
            energy_normalize=True)
        x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        logits, s = model.apply(variables, x)
        assert logits.shape == (2, 50)
        assert s.shape == (2, 1, 64, 51)
        # sigmoid output
        assert float(logits.min()) >= 0 and float(logits.max()) <= 1

    def test_cnn6_train_mode_with_augment(self, rng):
        model = models.MelPANNsNet(
            n_classes=10, init_lambd=46.67, n_mels=64, n_points=4000,
            sample_rate=8000, hop_length=80, optimized=True,
            window_length=128, energy_normalize=True, augment=True)
        x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x)
        (logits, _), updates = model.apply(
            variables, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1),
                  "augment": jax.random.PRNGKey(2)})
        assert logits.shape == (2, 10)
        assert "batch_stats" in updates

    def test_specaugment_masks(self, rng):
        from dmel_tpu.models.panns import time_mask, freq_mask
        x = jnp.ones((4, 100, 64, 1))
        tm = time_mask(jax.random.PRNGKey(0), x, 64)
        fm = freq_mask(jax.random.PRNGKey(1), x, 8)
        assert tm.shape == x.shape and fm.shape == x.shape
        # masks zero out a contiguous region (with high probability some
        # sample has a nonempty mask)
        assert float(tm.min()) == 0.0
        # iid: different samples get different masks
        per_sample = np.asarray(tm.sum(axis=(1, 2, 3)))
        assert len(np.unique(per_sample)) > 1


class TestRegistry:
    def test_all_reference_model_names(self):
        for name in ["linear_net", "bn_linear_net", "mlp_net", "conv_net",
                     "mel_linear_net", "mel_mlp_net", "mel_conv_net",
                     "panns_cnn6"]:
            config = dict(model_name=name, dataset_name="time_frequency",
                          init_lambd=6.38, n_points=128, hop_length=1,
                          optimized=False, normalize_window=False,
                          n_mels=16, resample_rate=8000,
                          energy_normalize=True)
            model = models.get_model_by_config(config)
            assert model is not None

    def test_n_classes(self):
        assert models.n_classes_for("time_frequency") == 3
        assert models.n_classes_for("audio_mnist") == 10
        assert models.n_classes_for("esc50") == 50
        with pytest.raises(ValueError):
            models.n_classes_for("nope")


class TestEvalDropoutQuirk:
    def test_eval_dropout_reproduces_reference_bug(self, rng):
        """The reference's F.dropout runs at eval time in
        MelLinearNet/MelMlpNet (models.py:76,101); eval_dropout=True
        opts into that behavior."""
        x = jnp.asarray(rng.standard_normal((4, 128)).astype(np.float32))
        sane = models.MelLinearNet(n_classes=3, init_lambd=6.38, n_mels=8,
                                   n_points=128, sample_rate=8000,
                                   hop_length=8)
        buggy = models.MelLinearNet(n_classes=3, init_lambd=6.38, n_mels=8,
                                    n_points=128, sample_rate=8000,
                                    hop_length=8, eval_dropout=True)
        v = sane.init(jax.random.PRNGKey(0), x)
        a1, _ = sane.apply(v, x)
        a2, _ = sane.apply(v, x)
        # sane eval: deterministic
        assert float(jnp.max(jnp.abs(a1 - a2))) == 0.0
        b1, _ = buggy.apply(v, x, rngs={"dropout": jax.random.PRNGKey(1)})
        b2, _ = buggy.apply(v, x, rngs={"dropout": jax.random.PRNGKey(2)})
        # bug-compatible eval: stochastic
        assert float(jnp.max(jnp.abs(b1 - b2))) > 0.0
