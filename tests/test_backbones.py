"""Backbone tests: DCNv2 (zero-offset == dense conv), Swin-Tiny shapes +
static shifted-window masks, weight-converter mapping."""

import jax
import jax.numpy as jnp
import numpy as np

from lgd_tpu.ops.deform_conv import deform_conv2d_params


def test_dcnv2_zero_offsets_equals_dense_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 10, 12, 8).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32))
    offsets = jnp.zeros((2, 10, 12, 18))
    mask = jnp.ones((2, 10, 12, 9))
    out = deform_conv2d_params(x, w, offsets, mask, stride=1, dilation=1,
                               dtype=jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dcnv2_stride2_shape():
    x = jnp.zeros((1, 16, 16, 4))
    w = jnp.zeros((3, 3, 4, 8))
    Ho = Wo = 8
    offsets = jnp.zeros((1, Ho, Wo, 18))
    out = deform_conv2d_params(x, w, offsets, None, stride=2,
                               dtype=jnp.float32)
    assert out.shape == (1, 8, 8, 8)


def test_dcnv2_integer_shift_offsets():
    """Offset of exactly (+1, 0) on every tap == convolving the shifted
    image (interior pixels)."""
    rng = np.random.RandomState(1)
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, :, :, 0] = rng.randn(8, 8)
    w = np.zeros((3, 3, 1, 1), np.float32)
    w[1, 1, 0, 0] = 1.0  # identity kernel (center tap)
    offsets = np.zeros((1, 8, 8, 18), np.float32)
    offsets[..., 0::2] = 1.0  # dy = +1 for every tap
    out = deform_conv2d_params(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(offsets), None, dtype=jnp.float32)
    # output(i, j) = x(i+1, j) for interior rows
    np.testing.assert_allclose(np.asarray(out)[0, :7, :, 0], x[0, 1:, :, 0],
                               atol=1e-5)


def test_dcnv2_dense_matches_gather_with_grads():
    """The dense one-hot-matmul path must reproduce the gather path (the
    CUDA-semantics oracle) bit-near-bit for offsets within the y window,
    in values AND gradients (x/offsets/mask/weight)."""
    rng = np.random.RandomState(7)
    B, H, W, C, F = 2, 9, 11, 8, 6
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, F).astype(np.float32) * 0.1)
    # offsets up to +-5.5 incl. fractions; y window 16 covers +-6
    offsets = jnp.asarray(
        (rng.rand(B, H, W, 18).astype(np.float32) - 0.5) * 11.0)
    mask = jnp.asarray(rng.rand(B, H, W, 9).astype(np.float32))

    def run(impl):
        def loss(x, w, offsets, mask):
            out = deform_conv2d_params(x, w, offsets, mask, stride=1,
                                       dilation=1, dtype=jnp.float32,
                                       impl=impl)
            return jnp.sum(out * jnp.cos(out)), out

        (l, out), grads = jax.value_and_grad(
            loss, argnums=(0, 1, 2, 3), has_aux=True)(x, w, offsets, mask)
        return out, grads

    out_d, g_d = run("dense")
    out_g, g_g = run("gather")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                               rtol=1e-4, atol=1e-5)
    for a, b, name in zip(g_d, g_g, ("x", "w", "offsets", "mask")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5, err_msg=name)


def test_dcnv2_dense_stride2_matches_gather():
    rng = np.random.RandomState(3)
    B, H, W, C, F = 1, 12, 10, 4, 5
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, F).astype(np.float32) * 0.1)
    Ho, Wo = 6, 5
    offsets = jnp.asarray(
        (rng.rand(B, Ho, Wo, 18).astype(np.float32) - 0.5) * 8.0)
    mask = jnp.asarray(rng.rand(B, Ho, Wo, 9).astype(np.float32))
    out_d = deform_conv2d_params(x, w, offsets, mask, stride=2,
                                 dtype=jnp.float32, impl="dense")
    out_g = deform_conv2d_params(x, w, offsets, mask, stride=2,
                                 dtype=jnp.float32, impl="gather")
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                               rtol=1e-4, atol=1e-5)


def test_swin_tiny_shapes():
    from lgd_tpu.models.backbones.swin import SwinTransformer

    model = SwinTransformer(dtype=jnp.float32, drop_path_rate=0.0)
    x = jnp.zeros((1, 224, 224, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out["stage2"].shape == (1, 56, 56, 96)
    assert out["stage3"].shape == (1, 28, 28, 192)
    assert out["stage4"].shape == (1, 14, 14, 384)
    assert out["stage5"].shape == (1, 7, 7, 768)


def test_swin_shift_mask_static():
    from lgd_tpu.models.backbones.swin import _shift_attn_mask

    m = _shift_attn_mask(14, 14, 7, 3)
    assert m.shape == (4, 49, 49)
    # the first (interior) window has no cross-region pairs
    assert (m[0] == 0).all()
    # the last (corner) window mixes regions
    assert (m[-1] < 0).any()


def test_swin_weight_converter_mapping():
    from lgd_tpu.utils.weight_convert import convert_swin_state

    raw = {
        "patch_embed.proj.weight": np.zeros((96, 3, 4, 4)),
        "patch_embed.proj.bias": np.zeros(96),
        "patch_embed.norm.weight": np.ones(96),
        "patch_embed.norm.bias": np.zeros(96),
        "layers.0.blocks.0.norm1.weight": np.ones(96),
        "layers.0.blocks.0.attn.qkv.weight": np.zeros((288, 96)),
        "layers.0.blocks.0.attn.relative_position_bias_table":
            np.zeros((169, 3)),
        "layers.0.blocks.0.mlp.fc1.weight": np.zeros((384, 96)),
        "layers.0.downsample.reduction.weight": np.zeros((192, 384)),
        "norm0.weight": np.ones(96),
    }
    conv = convert_swin_state(raw)
    p = conv["params"]
    assert p["patch_embed"]["kernel"].shape == (4, 4, 3, 96)
    assert p["stage2_block0"]["attn"]["qkv"]["kernel"].shape == (96, 288)
    assert p["stage2_block0"]["mlp_fc1"]["kernel"].shape == (96, 384)
    assert p["stage2_downsample"]["reduction"]["kernel"].shape == (384, 192)
    assert "scale" in p["stage2_norm"]


def test_resnet_pkl_converter_mapping():
    from lgd_tpu.utils.weight_convert import convert_resnet_state

    # raw caffe2-style ImageNet-pkl names, handled natively by the converter
    raw = {
        "conv1_w": np.zeros((64, 3, 7, 7)),
        "res_conv1_bn_s": np.ones(64),
        "res2_0_branch2a_w": np.zeros((64, 64, 1, 1)),
        "res2_0_branch2a_bn_s": np.ones(64),
        "res2_0_branch2a_bn_b": np.zeros(64),
        "res2_0_branch1_w": np.zeros((256, 64, 1, 1)),
        "fc1000_w": np.zeros((1000, 2048)),  # classifier -> dropped
    }
    conv = convert_resnet_state(raw)
    p = conv["params"]
    assert p["stem_conv1"]["kernel"].shape == (7, 7, 3, 64)
    assert p["res2_0"]["conv1"]["kernel"].shape == (1, 1, 64, 64)
    assert p["res2_0"]["shortcut"]["kernel"].shape == (1, 1, 64, 256)
    f = conv["frozen"]
    assert "scale" in f["stem_conv1_norm"]
    assert "bias" in f["res2_0"]["conv1_norm"]


def test_swin_ape():
    """APE param exists, is resized to the canvas, and shifts outputs
    (swin_transformer.py:505-513,596-599)."""
    from lgd_tpu.models.backbones.swin import SwinTransformer
    from lgd_tpu.utils.weight_convert import convert_swin_state

    model = SwinTransformer(dtype=jnp.float32, drop_path_rate=0.0, ape=True,
                            depths=(1, 1), num_heads=(3, 6),
                            out_features=("stage3",))
    x = jnp.zeros((1, 112, 112, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    pe = variables["params"]["absolute_pos_embed"]
    assert pe.shape == (1, 56, 56, 96)
    out0 = model.apply(variables, x)["stage3"]
    # zero image: output is a pure function of the (nonzero) APE; without
    # APE the same zero image gives a different constant map
    novars = {"params": dict(variables["params"])}
    novars["params"]["absolute_pos_embed"] = jnp.zeros_like(pe)
    out1 = model.apply(novars, x)["stage3"]
    assert float(jnp.max(jnp.abs(out0 - out1))) > 0

    # converter maps the NCHW buffer to NHWC
    conv = convert_swin_state({"absolute_pos_embed":
                               np.zeros((1, 96, 56, 56), np.float32)})
    assert conv["params"]["absolute_pos_embed"].shape == (1, 56, 56, 96)


def test_swin_forward_golden_window_layout():
    """The window-layout-persistent Swin (blocks run on (B, nW, N, C);
    cyclic shift = static permutation gather, pad re-zeroed pointwise) must
    reproduce the canvas-round-trip formulation bit-for-bit. The golden was
    generated from the per-block pad/roll/partition implementation (commit
    4ca1bdb) with the same init seed; non-49-divisible canvas exercises the
    pad-token masking."""
    from lgd_tpu.models.backbones.swin import SwinTransformer

    model = SwinTransformer(dtype=jnp.float32, drop_path_rate=0.0)
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 97, 113, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(11), x)
    out = model.apply(params, x)
    gold = np.load("tests/data/swin_forward_golden.npz")
    for k in gold.files:
        np.testing.assert_allclose(np.asarray(out[k]), gold[k],
                                   atol=2e-5, rtol=1e-5, err_msg=k)


def test_swin_shift_perm_matches_roll_partition():
    """_shift_perms gather == window_partition(roll(canvas)) elementwise."""
    from lgd_tpu.models.backbones.swin import (_shift_perms,
                                               window_partition)

    rng = np.random.RandomState(0)
    hp, wp, ws, s = 21, 28, 7, 3
    x = rng.randn(2, hp, wp, 5).astype(np.float32)
    want = np.asarray(window_partition(
        jnp.roll(jnp.asarray(x), (-s, -s), axis=(1, 2)), ws))
    perm, inv = _shift_perms(hp, wp, ws, s)
    xw = np.asarray(window_partition(jnp.asarray(x), ws))
    n_w = (hp // ws) * (wp // ws)
    flat = xw.reshape(2, n_w * ws * ws, 5)
    got = flat[:, perm].reshape(2 * n_w, ws * ws, 5)
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(flat[:, perm][:, inv], flat)


def test_swin_drop_path_active_in_training():
    """The reference trains Swin-T with drop_path_rate=0.2
    (swin_transformer.py:17,167,388): two train-mode applies with different
    dropout rngs must differ, eval mode must be deterministic, and the
    train flag must reach the backbone through the CT student
    (VERDICT r3 missing #2 — it used to be a silent no-op)."""
    from lgd_tpu.models.backbones.swin import SwinTransformer

    model = SwinTransformer(dtype=jnp.float32, drop_path_rate=0.5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)

    def run(seed, deterministic):
        out = model.apply(variables, x, deterministic=deterministic,
                          rngs={"dropout": jax.random.PRNGKey(seed)})
        return np.asarray(out["stage5"])

    a, b = run(1, False), run(2, False)
    assert not np.allclose(a, b), "drop-path inactive under train mode"
    e1, e2 = run(1, True), run(2, True)
    np.testing.assert_array_equal(e1, e2)

    # through the CT student: train=True + dropout rng -> stochastic
    from lgd_tpu.config import get_cfg
    from lgd_tpu.models.heads.retinanet import RetinaNetCT
    from lgd_tpu.config.cfg import FrozenCfg

    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = "build_retinanet_swint_fpn_backbone"
    cfg.MODEL.SWINT.DROP_PATH_RATE = 0.5
    cfg.MODEL.SWINT.OUT_FEATURES = ["stage3", "stage4", "stage5"]
    cfg.MODEL.FPN.IN_FEATURES = ["stage3", "stage4", "stage5"]
    cfg.freeze()
    student = RetinaNetCT(cfg=FrozenCfg(cfg), dtype=jnp.float32)
    img = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3)) * 50 + 100
    sizes = jnp.asarray([[64, 64]], jnp.int32)
    variables = student.init(jax.random.PRNGKey(0), img, sizes)

    def feats(seed, train):
        _, f = student.apply(variables, img, sizes, train,
                             rngs={"dropout": jax.random.PRNGKey(seed)})
        return np.asarray(f["p3"])

    t1, t2 = feats(1, True), feats(2, True)
    assert not np.allclose(t1, t2), "train flag not threaded to bottom_up"
    np.testing.assert_array_equal(feats(1, False), feats(2, False))


def test_dcnv2_dense_exact_on_trained_scale_offsets():
    """VERDICT r3 #6: the dense path's y-window clamp must be irrelevant at
    trained offset magnitudes. Trained DCN offsets are zero-initialized and
    stay small (std ~1-2 feature px; detectron2 model zoo); at N(0, 1.5)
    clipped to the documented +-6 exactness range, dense == gather."""
    from lgd_tpu.ops.deform_conv import deform_conv2d_params

    rng = np.random.RandomState(3)
    B, H, W, C, F = 2, 14, 18, 8, 16
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, C, F).astype(np.float32) * 0.1)
    off = np.clip(rng.randn(B, H, W, 18) * 1.5, -5.9, 5.9).astype(np.float32)
    m = (1 / (1 + np.exp(-rng.randn(B, H, W, 9)))).astype(np.float32)
    dense = deform_conv2d_params(x, w, jnp.asarray(off), jnp.asarray(m),
                                 dtype=jnp.float32, impl="dense")
    gather = deform_conv2d_params(x, w, jnp.asarray(off), jnp.asarray(m),
                                  dtype=jnp.float32, impl="gather")
    np.testing.assert_allclose(np.asarray(dense), np.asarray(gather),
                               rtol=1e-4, atol=1e-4)


def test_dcnv2_windowed_x_matches_gather_with_grads():
    """Wide maps window the x axis too (x_window='auto' at W >= 2*Dxw):
    within the documented +-((Dx-2)/2 - dil) = +-6 px contract, the
    column-chunked dense path must reproduce the gather oracle in values
    and all four gradients, for stride 1 AND 2 (chunk windows shift by
    stride), including out-of-image corners near the borders."""
    rng = np.random.RandomState(11)
    for stride in (1, 2):
        B, H, W, C, F = 2, 10, 80, 8, 6
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, C, F).astype(np.float32) * 0.1)
        Ho = (H + 1) // stride if stride == 2 else H
        Wo = (W + 1) // stride if stride == 2 else W
        offsets = jnp.asarray(
            (rng.rand(B, Ho, Wo, 18).astype(np.float32) - 0.5) * 11.0)
        mask = jnp.asarray(rng.rand(B, Ho, Wo, 9).astype(np.float32))

        def run(impl, x_window):
            def loss(x, w, offsets, mask):
                out = deform_conv2d_params(
                    x, w, offsets, mask, stride=stride, dtype=jnp.float32,
                    impl=impl, x_window=x_window)
                return jnp.sum(out * jnp.cos(out)), out

            (l, out), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2, 3), has_aux=True)(
                    x, w, offsets, mask)
            return out, grads

        # W=80 >= 2*((16-1)*stride+16): 'auto' must enable the x window
        out_d, g_d = run("dense", "auto")
        out_g, g_g = run("gather", None)
        np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_g),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"stride={stride}")
        for a, b, name in zip(g_d, g_g, ("x", "w", "offsets", "mask")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5,
                err_msg=f"stride={stride} grad {name}")


def test_dcnv2_auto_routes_eval_to_exact_gather():
    """TPU.DCN_IMPL='auto': eval (deterministic=True) uses the gather path,
    exact for ANY offset; training uses the fast dense path (clamped at
    |dy| > 6). Verified by injecting a +10 px dy through the offset-conv
    bias: eval output must equal the forced-gather reference; the train
    path (dense) must differ, proving the routing switches."""
    from lgd_tpu.models.backbones.resnet import ResNet

    def build(impl):
        return ResNet(depth=18, out_features=("res3",),
                      deform_on_per_stage=(True, False, False, False),
                      deform_modulated=True, dcn_impl=impl,
                      dtype=jnp.float32)

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    auto = build("auto")
    variables = auto.init(jax.random.PRNGKey(1), x)

    # inject a large vertical offset (dy channels = even indices of the
    # first 18 offset channels, detectron2 layout)
    v = jax.tree.map(np.array, variables)
    bias = v["params"]["res2_0"]["conv2"]["offset_conv"]["bias"]
    bias[0:18:2] = 10.0
    v = jax.tree.map(jnp.asarray, v)

    out_eval = auto.apply(v, x, deterministic=True)["res3"]
    out_gather = build("gather").apply(v, x)["res3"]
    out_train = auto.apply(v, x, deterministic=False)["res3"]
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(out_gather),
                               rtol=1e-5, atol=1e-5)
    assert not np.allclose(np.asarray(out_train), np.asarray(out_eval),
                           atol=1e-3), "dense should clamp a 10 px dy"


def test_dcn_pallas_impl_matches_dense():
    """impl='pallas' (fused VMEM interpolation; interpret mode on CPU) must
    reproduce impl='dense' in values AND all four gradients (the backward
    is dense's VJP by construction, but the primal feeds it), for stride 1
    and 2, on a wide map so the x window ('auto') activates and on a
    narrow map where it does not."""
    rng = np.random.RandomState(13)
    for stride, W in ((1, 80), (2, 80), (1, 12)):
        B, H, C, F = 2, 10, 8, 6
        x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, C, F).astype(np.float32) * 0.1)
        Ho = (H + 1) // stride if stride == 2 else H
        Wo = (W + 1) // stride if stride == 2 else W
        offsets = jnp.asarray(
            (rng.rand(B, Ho, Wo, 18).astype(np.float32) - 0.5) * 11.0)
        mask = jnp.asarray(rng.rand(B, Ho, Wo, 9).astype(np.float32))

        def run(impl):
            def loss(x, w, offsets, mask):
                out = deform_conv2d_params(
                    x, w, offsets, mask, stride=stride, dtype=jnp.float32,
                    impl=impl, x_window="auto")
                return jnp.sum(out * jnp.cos(out)), out

            (_, out), grads = jax.value_and_grad(
                loss, argnums=(0, 1, 2, 3), has_aux=True)(
                    x, w, offsets, mask)
            return out, grads

        out_p, g_p = run("pallas")
        out_d, g_d = run("dense")
        np.testing.assert_allclose(
            np.asarray(out_p), np.asarray(out_d), rtol=1e-5, atol=1e-5,
            err_msg=f"stride={stride} W={W}")
        for a, b, name in zip(g_p, g_d, ("x", "w", "offsets", "mask")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"stride={stride} W={W} grad {name}")


def test_swin_attention_bf16_close_to_f32():
    """Documented deviation (README 'Status / deviations'): window-attention
    qk logits / bias / mask adds run in bf16 with an f32 softmax (the
    reference uses fp16 AMP). On unit-scale inputs the bf16 path must stay
    within atol 2e-2 of the all-f32 path."""
    from lgd_tpu.models.backbones.swin import WindowAttention, _shift_attn_mask

    rng = jax.random.PRNGKey(3)
    Bn, ws, C, H = 8, 7, 96, 3
    x = jax.random.normal(rng, (Bn, ws * ws, C), jnp.float32)
    mask = jnp.asarray(_shift_attn_mask(14, 14, ws, ws // 2))  # (4, N, N)
    attn_bf = WindowAttention(dim=C, num_heads=H, window_size=ws,
                              dtype=jnp.bfloat16)
    attn_f32 = WindowAttention(dim=C, num_heads=H, window_size=ws,
                               dtype=jnp.float32)
    variables = attn_f32.init(jax.random.PRNGKey(4), x, mask)
    out_f = attn_f32.apply(variables, x, mask)
    out_b = attn_bf.apply(variables, x, mask)
    np.testing.assert_allclose(np.asarray(out_b, np.float32),
                               np.asarray(out_f), atol=2e-2)
