"""Shared deterministic jittable test module honoring the fused-engine
contract (fused.py) — decisive maps, no params, instant compile."""

import jax.numpy as jnp


class SyntheticModule:
    """Jittable flax-like module emitting decisive maps from image
    content, honoring the engine contract (fused.py:142-160): sem logits
    at input * 2^(render_steps-2) resolution, ctr/offsets at input/4
    resolution with offsets in input-resolution units pointing at the
    (single) foreground centroid."""

    num_classes = 1

    def apply(self, variables, images, train=False, render_steps=2,
              interpolate_ins=False, **_):
        del variables, train, interpolate_ins
        x = images[..., 0]                       # (B, H, W)
        up = 2 ** (render_steps - 2)
        m = (x > 0.5).astype(jnp.float32)
        xu = jnp.repeat(jnp.repeat(m, up, axis=1), up, axis=2)
        sem_logits = (xu * 16.0 - 8.0)[..., None]

        b, h, w = x.shape
        hq, wq = h // 4, w // 4
        mq = m.reshape(b, hq, 4, wq, 4).mean((2, 4))
        yy = jnp.arange(hq, dtype=jnp.float32)[None, :, None] * 4
        xx = jnp.arange(wq, dtype=jnp.float32)[None, None, :] * 4
        tot = jnp.maximum(mq.sum((1, 2), keepdims=True), 1e-6)
        cy = (mq * yy).sum((1, 2), keepdims=True) / tot
        cx = (mq * xx).sum((1, 2), keepdims=True) / tot
        has_fg = (mq.sum((1, 2), keepdims=True) > 1e-3).astype(jnp.float32)
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        ctr = jnp.exp(-d2 / 32.0) * has_fg       # (B, hq, wq)
        off = jnp.stack(
            [jnp.broadcast_to(cy - yy, (b, hq, wq)),
             jnp.broadcast_to(cx - xx, (b, hq, wq))], axis=-1)
        return {"sem_logits": sem_logits,
                "ctr_hmp": ctr[..., None],
                "offsets": off}
