"""Grouped-convolution TinyROICNN: frames packed into conv channel groups.

With 1-24 channels per frame, XLA's conv lowering leaves the MXU nearly
idle. Packing G frames into the channel dimension and running every conv as
a ``feature_group_count=G`` grouped convolution (all groups sharing the same
tiled weights) gives XLA G-times-wider channel dims to tile, while each
frame's math stays exactly the per-frame convolution — the output is
**bitwise identical** to the per-frame path (verified in
tests/test_grouped_cnn.py), so it is safe for both the live and training
forwards.

Measured (v5e-1, 8192 frames, f32): conv1 alone is ~3.9x faster grouped;
end-to-end 5.8 ms vs 6.7 ms at G=16 (G=32: 6.0, G=64: 8.4 — later convs gain
nothing, so bigger groups lose), a modest but free win wired as
``roi_impl='grouped'``.

Training: the path is differentiable (plain XLA grouped conv; one-step param
parity pinned in tests/test_grouped_cnn.py) but measured SLOWER end-to-end
for the train step (scripts/bench_train.py: B=16 f32 10.6 vs 3.1 ms, B=256
f32 34.1 vs 32.8 ms) — the tiled-weight backward's group reduction costs
more than the forward saves, so the training default stays 'xla'.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

DEFAULT_GROUP = 16


def _grouped_conv(x, w, b, groups: int):
    """x: (B, H, W, Ci*G) group-major; w: (3, 3, Ci, Co); shared weights
    tiled across groups. Returns (B, H, W, Co*G) group-major."""
    y = lax.conv_general_dilated(
        x,
        jnp.tile(w.astype(x.dtype), (1, 1, 1, groups)),
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=x.dtype,
    )
    return y + jnp.tile(b.astype(x.dtype), groups)


def _pool(x):
    # init must be a scalar literal (not a traced array) for jax to pick the
    # differentiable reduce-window-max path
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def roi_cnn_grouped(
    params: dict,
    roi_norm: jnp.ndarray,
    *,
    group: int = DEFAULT_GROUP,
) -> jnp.ndarray:
    """TinyROICNN over (N, H, W) float frames (already normalized), frames
    packed into channel groups. params: models/bigru.py roi_cnn pytree.
    Returns (N, emb) in the input dtype's accumulation (mean/fc in f32).
    """
    n, H, W = roi_norm.shape
    G = group
    while n % G != 0:  # ragged batches: fall back to a divisor
        G //= 2
        if G <= 1:
            G = 1
            break
    if G <= 1:
        x = roi_norm[..., None]
    else:
        x = roi_norm.reshape(n // G, G, H, W).transpose(0, 2, 3, 1)

    h = _pool(jax.nn.relu(_grouped_conv(x, params["conv0"]["w"],
                                        params["conv0"]["b"], G)))
    h = _pool(jax.nn.relu(_grouped_conv(h, params["conv1"]["w"],
                                        params["conv1"]["b"], G)))
    h = jax.nn.relu(_grouped_conv(h, params["conv2"]["w"],
                                  params["conv2"]["b"], G))
    feat = jnp.mean(h.astype(jnp.float32), axis=(1, 2))  # (n/G, 24*G)
    if G > 1:
        feat = feat.reshape(n // G, G, -1).reshape(n, -1)
    return feat @ params["fc"]["w"].astype(jnp.float32) + params["fc"][
        "b"
    ].astype(jnp.float32)
