"""Parity-packed fully-fused Pallas TinyROICNN (roi_impl='fused') vs the XLA
reference path, interpret mode (ops/pallas_cnn2.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from silent_speech_tpu.models import bigru as model
from silent_speech_tpu.models.bigru import (
    init_roi_cnn,
    preprocess_roi,
    roi_cnn_forward,
)
from silent_speech_tpu.ops.pallas_cnn2 import (
    pack_roi_cnn_fused,
    pack_roi_cnn_fused_traceable,
    roi_cnn_fused,
)


def _ref(params, roi_u8, standardize):
    r = preprocess_roi(roi_u8[None], standardize)  # (1, N, H, W)
    return np.asarray(roi_cnn_forward(params, r))[0]


def test_fused2_cnn_matches_xla(rng):
    params = init_roi_cnn(jax.random.PRNGKey(0))
    packed = pack_roi_cnn_fused(params)
    roi = rng.integers(0, 256, (32, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=False)
    got = np.asarray(roi_cnn_fused(jnp.asarray(roi), packed, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused2_cnn_standardize_path(rng):
    params = init_roi_cnn(jax.random.PRNGKey(1))
    packed = pack_roi_cnn_fused(params)
    roi = rng.integers(0, 256, (16, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=True)
    got = np.asarray(
        roi_cnn_fused(jnp.asarray(roi), packed, standardize=True,
                      interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-3, rtol=1e-3)


def test_fused2_cnn_ragged_batch(rng):
    """N not divisible by the frame tile (pad + slice back)."""
    params = init_roi_cnn(jax.random.PRNGKey(2))
    packed = pack_roi_cnn_fused(params)
    roi = rng.integers(0, 256, (21, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=False)
    got = np.asarray(roi_cnn_fused(jnp.asarray(roi), packed, interpret=True))
    assert got.shape == (21, 32)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_fused2_f_tile_reassociation_only(rng):
    """f_tile only re-tiles the grid (taller matmul M). The conv stages are
    per-row and exactly invariant; the mean/standardize frame-selector dots
    contract over K=M, so a different f_tile regroups their f32 reduction
    tree — drift must stay at reassociation scale (<=1e-6, measured
    1.5e-8), for both stage-2 variants."""
    import pytest

    params = init_roi_cnn(jax.random.PRNGKey(5))
    packed = pack_roi_cnn_fused(params)
    roi = jnp.asarray(rng.integers(0, 256, (40, 48, 96), dtype=np.uint8))
    for variant in ("wide", "tiled", "tiled3"):
        base = np.asarray(roi_cnn_fused(roi, packed, interpret=True,
                                        variant=variant))
        for f_tile in (2, 8, 32):
            got = np.asarray(roi_cnn_fused(roi, packed, interpret=True,
                                           variant=variant, f_tile=f_tile))
            np.testing.assert_allclose(got, base, atol=1e-6, rtol=0)
    with pytest.raises(ValueError, match="f_tile"):
        roi_cnn_fused(roi, packed, interpret=True, f_tile=3)


def test_fused2_traceable_pack_matches_numpy_pack():
    """The jit-traceable scatter pack must produce the exact matrices the
    host-side numpy pack does (forward packs inline under jit with it)."""
    params = init_roi_cnn(jax.random.PRNGKey(3))
    a = pack_roi_cnn_fused(params)
    b = jax.jit(pack_roi_cnn_fused_traceable)(params)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)


def test_fused2_variant_scoped_pack(rng):
    """pack_roi_cnn_fused(variant=...) builds only the matrices that
    variant's kernel reads (a fixed-variant Predictor shouldn't keep the
    ~6 MB full-width w2/w3 resident) and runs bitwise-identical to the
    pack-everything dict."""
    params = init_roi_cnn(jax.random.PRNGKey(7))
    full = pack_roi_cnn_fused(params)
    roi = jnp.asarray(rng.integers(0, 256, (12, 48, 96), dtype=np.uint8))
    expect = {
        "wide": {"w2", "w3", "b3"},
        "tiled": {"w2t", "w3", "b3"},
        "tiled3": {"w2t", "w3t", "b3t"},
        "stacked": {"w2t", "w3t", "b3t"},
    }
    always = {"w1e", "w1o", "b1", "b2", "fc_w", "fc_b"}
    for variant, extra in expect.items():
        scoped = pack_roi_cnn_fused(params, variant=variant)
        assert set(scoped) == always | extra, variant
        for k in scoped:
            np.testing.assert_array_equal(np.asarray(scoped[k]),
                                          np.asarray(full[k]), err_msg=k)
        a = np.asarray(roi_cnn_fused(roi, full, interpret=True,
                                     variant=variant))
        b = np.asarray(roi_cnn_fused(roi, scoped, interpret=True,
                                     variant=variant))
        np.testing.assert_array_equal(a, b, err_msg=variant)


def test_fused2_forward_roi_impl(rng):
    """roi_impl='fused' through the full live forward (packs under jit)
    matches the default path."""
    mcfg = model.BiGRUConfig(x_dim=12, num_classes=5, use_roi=True,
                             hidden=16, roi_emb=8)
    params = model.init_params(jax.random.PRNGKey(4), mcfg)
    B, T = 3, 18
    X = jnp.asarray(rng.standard_normal((B, T, 12)).astype(np.float32))
    lengths = jnp.asarray(np.array([18, 7, 12], np.int32))
    roi = jnp.asarray(rng.integers(0, 256, (B, T, 48, 96), dtype=np.uint8))
    want = np.asarray(model.live_forward(params, mcfg, X, lengths, roi))
    got = np.asarray(
        jax.jit(
            lambda p, x, l, r: model.live_forward(p, mcfg, x, l, r,
                                                  roi_impl="fused")
        )(params, X, lengths, roi)
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_fused2_bf16_mode(rng):
    """bf16 serving mode: activations/weights bf16, f32 accumulation —
    stays within bf16-epsilon-scale error of the f32 reference (the hard
    gate for bf16 serving is argmax, tests/test_bf16_parity.py)."""
    params = init_roi_cnn(jax.random.PRNGKey(5))
    packed = pack_roi_cnn_fused(params)
    roi = rng.integers(0, 256, (32, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=False)
    scale = np.abs(ref).max()
    for variant in ("wide", "tiled", "tiled3"):
        got = np.asarray(
            roi_cnn_fused(jnp.asarray(roi), packed, interpret=True,
                          compute_dtype=jnp.bfloat16, variant=variant)
        )
        assert np.abs(got - ref).max() < 0.02 * scale


def test_fused2_tiled_variant(rng):
    """The 'tiled' stage-2 variant (2.25x fewer packed MACs, 160-lane
    slices) and the 'tiled3' variant (stage-3 tiled the same way, 0.59x
    its packed MACs, w*32+co padded output layout) compute the same
    function as 'wide', including on the standardize path."""
    params = init_roi_cnn(jax.random.PRNGKey(6))
    packed = pack_roi_cnn_fused(params)
    roi = rng.integers(0, 256, (32, 48, 96), dtype=np.uint8)
    for standardize in (False, True):
        ref = _ref(params, jnp.asarray(roi), standardize=standardize)
        for variant in ("tiled", "tiled3"):
            got = np.asarray(
                roi_cnn_fused(jnp.asarray(roi), packed, interpret=True,
                              variant=variant, standardize=standardize)
            )
            tol = 2e-3 if standardize else 2e-4
            np.testing.assert_allclose(got, ref, atol=tol, rtol=tol / 2)


def test_fused2_stacked_variants_bitwise_equal_tiled3(rng):
    """'stacked' (every stage's tile dots stacked on M into one tall dot)
    and 'stacked1' (stage 1 only stacked, stages 2/3 tiled3) reorder ROWS
    of the same matmuls, never their K contractions — both must be BITWISE
    equal to 'tiled3' in f32 and bf16 modes (max commutes with the monotone
    bf16 rounding). Measured on-chip 2026-08-18: full 'stacked' loses e2e
    (49.1k vs 55.1k clips/s) — stage-1 stacking wins 0.38 ms but stages 2/3
    stacking loses more; 'stacked1' keeps only the winning half."""
    params = init_roi_cnn(jax.random.PRNGKey(9))
    packed = pack_roi_cnn_fused(params)
    roi = jnp.asarray(rng.integers(0, 256, (24, 48, 96), dtype=np.uint8))
    for dtype in (jnp.float32, jnp.bfloat16):
        base = np.asarray(roi_cnn_fused(roi, packed, interpret=True,
                                        variant="tiled3",
                                        compute_dtype=dtype))
        for variant in ("stacked", "stacked1"):
            got = np.asarray(roi_cnn_fused(roi, packed, interpret=True,
                                           variant=variant,
                                           compute_dtype=dtype))
            assert np.array_equal(got, base), (variant, dtype)


def test_fused2_constant_frame_standardize_stays_finite(rng):
    """A constant (covered/saturated-camera) frame must not NaN-poison its
    frame tile: the in-kernel E[x^2]-E[x]^2 variance can go slightly
    negative in f32 and needs the clamp before sqrt (round-4 review fix).
    The constant frame itself amplifies f32 rounding by the 1e-6 std floor,
    so only the OTHER frames are compared numerically."""
    params = init_roi_cnn(jax.random.PRNGKey(7))
    packed = pack_roi_cnn_fused(params)
    roi = rng.integers(0, 256, (16, 48, 96), dtype=np.uint8)
    roi[3] = 128  # constant gray frame
    roi[11] = 255  # saturated white frame
    got = np.asarray(
        roi_cnn_fused(jnp.asarray(roi), packed, standardize=True,
                      interpret=True)
    )
    assert np.isfinite(got).all()
    ref = _ref(params, jnp.asarray(roi), standardize=True)
    keep = [i for i in range(16) if i not in (3, 11)]
    np.testing.assert_allclose(got[keep], ref[keep], atol=2e-3, rtol=1e-3)


def test_fused2_sharded_predictor_matches_base(rng):
    """roi_impl='fused' composes with Predictor.shard on a data mesh (the
    eval-dataset mesh_shape path): GSPMD partitions the batch around the
    Pallas call; logits match the unsharded default path."""
    from silent_speech_tpu.infer.predictor import Predictor
    from silent_speech_tpu.parallel.mesh import make_mesh

    cfg = model.BiGRUConfig(x_dim=12, num_classes=3, use_roi=True, hidden=8,
                            roi_emb=4, head_hidden=8)
    params = model.init_params(jax.random.PRNGKey(8), cfg)
    labels = {0: "a", 1: "b", 2: "c"}
    X = rng.standard_normal((11, 20, 12)).astype(np.float32)
    L = np.full((11,), 20, np.int32)
    R = rng.integers(0, 256, (11, 20, 48, 96), dtype=np.uint8)
    base = Predictor(params=params, cfg=cfg, id_to_label=labels, max_t=20,
                     buckets=(20,))
    want = base.predict_batch(X, L, R)
    p = Predictor(params=params, cfg=cfg, id_to_label=labels, max_t=20,
                  buckets=(20,), roi_impl="fused")
    p = p.shard(make_mesh(jax.devices("cpu"), data=8))
    got = p.predict_batch(X, L, R)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_fused2_front_dtypes_bitwise_equal(rng):
    """front='bf16'/'f32' pre-widen the raw 0..255 integers in XLA (exact:
    they fit bf16's 8 mantissa bits) while /255 stays f32 in-kernel — all
    fronts must be BITWISE identical (docs/ROI_CNN_PERF.md round-4
    follow-up 2 measured this on-chip too)."""
    params = init_roi_cnn(jax.random.PRNGKey(7))
    packed = pack_roi_cnn_fused(params)
    roi = jnp.asarray(rng.integers(0, 256, (16, 48, 96), dtype=np.uint8))
    base = np.asarray(roi_cnn_fused(roi, packed, interpret=True,
                                    variant="tiled3", front="u8"))
    for front in ("bf16", "f32"):
        got = np.asarray(roi_cnn_fused(roi, packed, interpret=True,
                                       variant="tiled3", front=front))
        assert np.array_equal(got, base), front


# ---------------------------------------------------------------------------
# int8 quantized serving variant ('tiled3_q8', scripts/probe_int8.py line)
# ---------------------------------------------------------------------------

def _q8_fake_quant_reference(params, roi_u8):
    """Independent reference for the tiled3_q8 contract: plain XLA convs
    over per-output-channel dequantized int8 weights, with the per-frame
    activation fake-quant (scale = frame_max/255, q = floor(v/a + .5) - 128,
    -128 encoding exactly 0) applied between stages. The kernel's integer
    dots + corrections must equal this to f32 rounding — NOT just be
    'close to f32': this pins the quantization scheme itself."""
    from jax import lax

    def qw(w):
        w = jnp.asarray(w, jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-30) / 127.0
        return jnp.clip(jnp.round(w / s), -127, 127) * s

    def qa(v):
        fm = jnp.maximum(jnp.max(v, axis=(1, 2, 3), keepdims=True), 1e-12)
        a = fm / 255.0
        return (jnp.floor(v / a + 0.5) - 128.0 + 128.0) * a

    conv = lambda x, w: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    pool = lambda x: jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    b = lambda k: jnp.asarray(params[k]["b"], jnp.float32)
    x = roi_u8[..., None].astype(jnp.float32) / 255.0
    c1 = jax.nn.relu(pool(conv(x, qw(params["conv0"]["w"]))) + b("conv0"))
    c2 = jax.nn.relu(pool(conv(qa(c1), qw(params["conv1"]["w"])))
                     + b("conv1"))
    c3 = jax.nn.relu(conv(qa(c2), qw(params["conv2"]["w"])) + b("conv2"))
    feat = c3.mean(axis=(1, 2))
    return (feat @ jnp.asarray(params["fc"]["w"], jnp.float32)
            + jnp.asarray(params["fc"]["b"], jnp.float32))


def test_fused2_q8_matches_fake_quant_reference(rng):
    """The int8 kernel equals the independent fake-quant reference to f32
    rounding (observed 1.9e-6; 3e-5 bar = 15x margin, still 300x below the
    ~1e-2 signature of a scheme bug like a wrong correction or pad)."""
    params = init_roi_cnn(jax.random.PRNGKey(5))
    pq = pack_roi_cnn_fused(params, variant="tiled3_q8")
    roi = rng.integers(0, 256, (64, 48, 96), dtype=np.uint8)
    ref = np.asarray(_q8_fake_quant_reference(params, jnp.asarray(roi)))
    got = np.asarray(roi_cnn_fused(jnp.asarray(roi), pq,
                                   variant="tiled3_q8", interpret=True))
    assert np.abs(got - ref).max() < 3e-5


def test_fused2_q8_close_to_f32_and_invariant(rng):
    """Quantization noise bound vs the exact path (observed 0.15% of the
    embedding scale on random init; 1% bar), plus the two invariances the
    per-FRAME scale design buys: a clip's embedding must not depend on its
    batch neighbors, and f_tile must only regroup the mean reduction."""
    params = init_roi_cnn(jax.random.PRNGKey(0))
    pq = pack_roi_cnn_fused(params, variant="tiled3_q8")
    roi = rng.integers(0, 256, (33, 48, 96), dtype=np.uint8)
    ref = _ref(params, jnp.asarray(roi), standardize=False)
    got = np.asarray(roi_cnn_fused(jnp.asarray(roi), pq,
                                   variant="tiled3_q8", interpret=True))
    assert got.shape == ref.shape  # ragged N=33 pads + slices back
    assert np.abs(got - ref).max() < 0.01 * np.abs(ref).max()
    sub = np.asarray(roi_cnn_fused(jnp.asarray(roi[:7]), pq,
                                   variant="tiled3_q8", interpret=True))
    np.testing.assert_array_equal(sub, got[:7])
    g8 = np.asarray(roi_cnn_fused(jnp.asarray(roi), pq,
                                  variant="tiled3_q8", f_tile=8,
                                  interpret=True))
    np.testing.assert_allclose(g8, got, atol=1e-6)


def test_fused2_q8_pack_matches_traceable(rng):
    """numpy pack and traceable pack agree on every q8 operand."""
    params = init_roi_cnn(jax.random.PRNGKey(2))
    a = pack_roi_cnn_fused(params, variant="tiled3_q8")
    b = pack_roi_cnn_fused_traceable(params, variant="tiled3_q8")
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_fused2_q8_serving_only_gates(rng):
    """tiled3_q8 is serving-only: standardize, non-u8 fronts and train=True
    must fail loudly at call/construction time."""
    import pytest

    params = init_roi_cnn(jax.random.PRNGKey(3))
    pq = pack_roi_cnn_fused(params, variant="tiled3_q8")
    roi = jnp.asarray(rng.integers(0, 256, (8, 48, 96), dtype=np.uint8))
    with pytest.raises(ValueError, match="serving-only"):
        roi_cnn_fused(roi, pq, variant="tiled3_q8", standardize=True,
                      interpret=True)
    with pytest.raises(ValueError, match="front"):
        roi_cnn_fused(roi, pq, variant="tiled3_q8", front="bf16",
                      interpret=True)
    mcfg = model.BiGRUConfig(x_dim=4, num_classes=3, use_roi=True, hidden=8,
                             roi_emb=4, head_hidden=8)
    params_m = model.init_params(jax.random.PRNGKey(4), mcfg)
    X = jnp.zeros((2, 6, 4), jnp.float32)
    L = jnp.full((2,), 6, jnp.int32)
    R = jnp.zeros((2, 6, 48, 96), jnp.uint8)
    with pytest.raises(ValueError, match="serving-only"):
        model.forward(params_m, mcfg, X, L, roi=R, train=True,
                      roi_impl="fused", roi_variant="tiled3_q8")


def test_fused2_q8_live_forward_route(rng):
    """roi_variant='tiled3_q8' rides the existing roi_impl='fused' plumbing
    end to end (traceable pack under jit included) and holds the guardrail
    shape of the bf16 mode on the full live forward."""
    mcfg = model.BiGRUConfig(x_dim=12, num_classes=5, use_roi=True,
                             hidden=16, roi_emb=8, head_hidden=16)
    params = model.init_params(jax.random.PRNGKey(6), mcfg)
    X = jnp.asarray(rng.standard_normal((3, 20, 12)), jnp.float32)
    L = jnp.full((3,), 20, jnp.int32)
    R = jnp.asarray(rng.integers(0, 256, (3, 20, 48, 96), dtype=np.uint8))
    f32 = np.asarray(model.live_forward(params, mcfg, X, L, R,
                                        roi_impl="fused"))
    q8 = np.asarray(model.live_forward(params, mcfg, X, L, R,
                                       roi_impl="fused",
                                       roi_variant="tiled3_q8"))
    assert np.abs(q8 - f32).max() < 0.05
