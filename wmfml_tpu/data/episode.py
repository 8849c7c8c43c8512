"""Episode batch: the single pytree every trainer/evaluator consumes.

TPU-first design (SURVEY §7.1 move 1): the reference feeds ragged context
sets whose shot varies per iteration (`dataset/shapenet_1d.py:120`,
`dataset/shapenet_3d.py:110`), recompiling nothing because torch is eager.
Under XLA that would trigger one compilation per shot value, so episodes are
*padded to max_ctx_num* and carry a boolean ``ctx_mask``; every aggregation
and loss is mask-aware, reproducing ragged math bit-for-bit while the train
step compiles exactly once.

Layout: images are channel-LAST ([T, N, H, W, C]) and kept uint8 on host when
the source data is uint8 — device transfer is 4x cheaper and normalization
fuses into the first conv on device.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

# An EpisodeBatch is a dict pytree with keys:
#   ctx_x   [T, S, H, W, C]  uint8/float32
#   ctx_y   [T, S, Dy]       float32   (raw labels; final encoding on device)
#   ctx_mask[T, S]           bool      (True = real context element)
#   qry_x   [T, Q, H, W, C]
#   qry_y   [T, Q, Dy]
EpisodeBatch = Dict[str, np.ndarray]


def make_episode(ctx_x, ctx_y, qry_x, qry_y, max_ctx: Optional[int] = None,
                 shot: Optional[int] = None) -> EpisodeBatch:
    """Assemble an episode, padding context to ``max_ctx`` with a mask.

    ctx_x/ctx_y arrive with S_actual = shot rows; padding replicates row 0
    (values are masked out everywhere, replication just avoids uninitialized
    memory influencing masked ops).
    """
    t, s_actual = ctx_x.shape[0], ctx_x.shape[1]
    if shot is None:
        shot = s_actual
    if max_ctx is None or s_actual == max_ctx:
        mask = np.zeros((t, ctx_x.shape[1]), dtype=bool)
        mask[:, :shot] = True
        return dict(ctx_x=ctx_x, ctx_y=np.asarray(ctx_y, np.float32),
                    ctx_mask=mask, qry_x=qry_x,
                    qry_y=np.asarray(qry_y, np.float32))
    assert s_actual <= max_ctx, (s_actual, max_ctx)
    pad = max_ctx - s_actual
    ctx_x = np.concatenate(
        [ctx_x, np.repeat(ctx_x[:, :1], pad, axis=1)], axis=1)
    ctx_y = np.concatenate(
        [ctx_y, np.repeat(ctx_y[:, :1], pad, axis=1)], axis=1)
    mask = np.zeros((t, max_ctx), dtype=bool)
    mask[:, :shot] = True
    return dict(ctx_x=ctx_x, ctx_y=np.asarray(ctx_y, np.float32),
                ctx_mask=mask, qry_x=qry_x, qry_y=np.asarray(qry_y, np.float32))


def episode_shapes(cfg) -> Dict[str, tuple]:
    """Static shapes of an episode for a given config (for AOT compiles)."""
    h, w, c = cfg.img_size
    t, s, q = cfg.tasks_per_batch, cfg.max_ctx_num, cfg.query_num
    dy = cfg.input_dim
    return dict(
        ctx_x=(t, s, h, w, c), ctx_y=(t, s, dy), ctx_mask=(t, s),
        qry_x=(t, q, h, w, c), qry_y=(t, q, dy),
    )
