"""VONet: patch extraction front-end + recurrent update operator.

TPU-native rewrite of dpvo/net.py (Update :27-92, Patchifier :95-157,
VONet :176-272). Functional: all weights live in one flat dict keyed by torch
state_dict names ("patchify.fnet...", "update.c1.0.weight", ...), so torch
checkpoints convert mechanically and random init produces identical trees.

Architecture constants match the reference: P=3 patch size, DIM=384 context
channels, RES=4 feature stride (net.py:179-184).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.patchify import extract_patches, avg_pool2d
from .blocks import (gated_residual, init_layer_norm, init_linear, layer_norm,
                     linear, mlp2, soft_agg)
from .extractor import (basic_encoder4, basic_encoder4_fused,
                        init_encoder_params)

P = 3
DIM = 384
RES = 4
CORR_IN = 2 * 49 * P * P  # two pyramid levels x 7x7 window x 3x3 patch


@dataclass
class VONetParams:
    """Flat name->array dict + a bf16 copy for the matmul-heavy paths."""
    f32: dict
    bf16: dict

    @classmethod
    def from_f32(cls, params):
        bf16 = {k: jnp.asarray(v, jnp.bfloat16) for k, v in params.items()}
        f32 = {k: jnp.asarray(v, jnp.float32) for k, v in params.items()}
        return cls(f32=f32, bf16=bf16)


jax.tree_util.register_pytree_node(
    VONetParams,
    lambda p: ((p.f32, p.bf16), None),
    lambda aux, ch: VONetParams(f32=ch[0], bf16=ch[1]),
)


def corr_native_perm(d=7):
    """j_ref -> j_native for the one-pass corr kernel's native layout.

    Reference corr_feat order (runtime corr_two_level):
    stack([c1, c2], -1).reshape(E, -1) over c* = (E, dx, dy, py, px).
    Native order (ops/corr_onepass.py layout='native'):
    concat([c1n.reshape(E,-1), c2n.reshape(E,-1)], -1) over
    c*n = (E, py*P+px, dy*d+dx).  Returns (CORR_IN,) int array such that
    x_ref[j] == x_native[perm[j]] for every edge."""
    lvls = []
    for lvl in range(2):
        nat = np.arange(P * P * d * d).reshape(P, P, d, d) + lvl * P * P * d * d
        lvls.append(nat.transpose(3, 2, 0, 1))       # (dx, dy, py, px)
    return np.stack(lvls, -1).reshape(-1)


def permute_params_for_native_corr(params):
    """Absorb the native corr channel order into update.corr.0's weight rows.

    x_native @ W_native == x_ref @ W_ref exactly (a row permutation commutes
    with the contraction), so runtimes feeding native-layout corr features
    skip the two ~6 ms full-output relayout transposes per frame."""
    perm = corr_native_perm()

    def fix(d):
        w = np.array(d['update.corr.0.weight'])
        wn = np.empty_like(w)
        wn[perm] = w
        out = dict(d)
        out['update.corr.0.weight'] = jnp.asarray(wn)
        return out

    return VONetParams(f32=fix(params.f32), bf16=fix(params.bf16))


# ---------------------------------------------------------------------------
# Patchifier (reference net.py:95-157)
# ---------------------------------------------------------------------------

def patchify_frame(params, image, coords, mixed_precision=True):
    """Run both encoders on one frame and gather patch features.

    image:  (H, W, 3) float32, normalized 2*(I/255)-0.5
    coords: (M, 2) float32 patch centroids in 1/RES resolution pixels
    returns dict with:
      fmap1 (H/4, W/4, 128)  matching features (level 1)
      fmap2 (H/16, W/16, 128) level-4 pooled features
      gmap  (M, P, P, 128)   patch feature tiles
      imap  (M, DIM)         context vectors
      patch_xy (M, 2, P, P)  patch pixel-coordinate grids (1/RES scale)
      clr   (M, 3)           RGB color at the patch centers (for viz)
    """
    net_dtype = jnp.bfloat16 if mixed_precision else jnp.float32
    p = params.bf16 if mixed_precision else params.f32
    x = image[None].astype(net_dtype)

    # one fused conv stack for both encoders (bitwise == two passes;
    # halves the patchify device time — see basic_encoder4_fused)
    fmap, imap = basic_encoder4_fused(p, 'patchify.fnet', 'patchify.inet', x)
    fmap, imap = fmap[0] / 4.0, imap[0] / 4.0

    gmap = extract_patches(fmap, coords, P // 2)               # (M, P, P, 128)
    imap_p = extract_patches(imap, coords, 0)[:, 0, 0, :]      # (M, DIM)

    # patch coordinate grids: integer offsets around the centroid
    off = jnp.arange(-(P // 2), P // 2 + 1, dtype=jnp.float32)
    gx = coords[:, 0, None, None] + off[None, None, :]
    gy = coords[:, 1, None, None] + off[None, :, None]
    patch_xy = jnp.stack([jnp.broadcast_to(gx, (coords.shape[0], P, P)),
                          jnp.broadcast_to(gy, (coords.shape[0], P, P))], axis=1)

    # color at full resolution (net.py:143): bilinear at 4*(coords+0.5)
    clr = extract_patches(image, 4.0 * (coords + 0.5), 0)[:, 0, 0, :]
    clr = (clr.astype(jnp.float32) + 0.5) * (255.0 / 2)

    fmap1 = avg_pool2d(fmap, 1)
    fmap2 = avg_pool2d(fmap, 4)

    return dict(fmap1=fmap1, fmap2=fmap2, gmap=gmap,
                imap=imap_p, patch_xy=patch_xy, clr=clr)


def image_gradient_scores(image, coords):
    """Mean 4x4-pooled gradient magnitude at candidate centroids.

    Used by CENTROID_SEL_STRAT == GRADIENT_BIAS (reference net.py:102-108).
    image: (H, W, 3) normalized; coords (K, 2) in 1/RES pixels.
    """
    gray = ((image + 0.5) * (255.0 / 2)).sum(axis=-1)
    dx = gray[:-1, 1:] - gray[:-1, :-1]
    dy = gray[1:, :-1] - gray[:-1, :-1]
    g = jnp.sqrt(dx ** 2 + dy ** 2)
    H4, W4 = (g.shape[0] // 4) * 4, (g.shape[1] // 4) * 4
    g = g[:H4, :W4].reshape(H4 // 4, 4, W4 // 4, 4).mean(axis=(1, 3))
    return extract_patches(g[..., None], coords, 0)[:, 0, 0, 0]


# ---------------------------------------------------------------------------
# Update operator (reference net.py:27-92)
# ---------------------------------------------------------------------------

def update_op(params, net, inp, corr_feat, ix, jx, kk_ids, pair_ids,
              num_segments, edge_mask, mixed_precision=True,
              num_segments_kk=None, num_segments_ij=None,
              gather_pairs=None):
    """One recurrent update over all active edges.

    net:       (E, DIM) hidden state
    inp:       (E, DIM) context (imap gathered per edge)
    corr_feat: (E, CORR_IN) correlation features
    ix, jx:    (E,) temporal neighbor edge indices, -1 if none
               (host-precomputed; replaces fastba.neighbors, ba.cpp:59-97)
    kk_ids:    (E,) dense group ids by patch (agg_kk)
    pair_ids:  (E,) dense group ids by frame pair ii*C+jj (agg_ij)
    edge_mask: (E,) bool valid-edge mask (padding rows False)
    num_segments_kk/ij: static bounds on the two aggs' group counts; pass
               tight bounds (live patches / live pairs) — the h-projection
               GEMM and scatter outputs are sized by them, and the default
               E is ~14-100x larger than the true group counts.

    returns (net', delta (E,2) f32, weight (E,2) f32)
    """
    if num_segments_kk is None:
        num_segments_kk = num_segments
    if num_segments_ij is None:
        num_segments_ij = num_segments
    dtype = jnp.bfloat16 if mixed_precision else jnp.float32
    p = params.bf16 if mixed_precision else params.f32
    net = net.astype(dtype)
    inp = inp.astype(dtype)
    corr_feat = corr_feat.astype(dtype)

    corr = mlp2(p, 'update.corr.0', 'update.corr.2', corr_feat)
    corr = layer_norm(p, 'update.corr.3', corr)
    corr = linear(p, 'update.corr.5', jax.nn.relu(corr))

    net = net + inp + corr
    net = layer_norm(p, 'update.norm', net)

    mask_ix = ((ix >= 0) & edge_mask)[:, None].astype(dtype)
    mask_jx = ((jx >= 0) & edge_mask)[:, None].astype(dtype)

    def neighbor(x, idx_e, idx_pair):
        if gather_pairs is not None:
            # pair-blocked edge tables (DeviceVO): the temporal neighbors
            # of a pair's M edges are the neighbor PAIR's M edges in order,
            # so the (E,)-row gather collapses to a (GP,)-row gather of
            # contiguous (M*DIM)-sized rows.  Run it as a one-hot MXU
            # matmul (ba_pairs.gather_rows): the fancy-index form lowers
            # to gather+relayout-transpose at ~0.9 ms/frame for the two
            # calls (GP=512, M=96, DIM=384); the one-hot is exact (each
            # output row sums exactly one source row).
            from ..ba_pairs import gather_rows
            Mg = gather_pairs[2]
            xp = x.reshape(-1, Mg * x.shape[-1])
            return gather_rows(
                xp, jnp.maximum(idx_pair, 0)).reshape(x.shape)
        return x[jnp.maximum(idx_e, 0)]

    # SEQUENTIAL: c2's gather sees the c1-updated hidden state (reference
    # net.py:80-85 applies the two temporal convs one after the other)
    gp = gather_pairs or (None, None, None)
    net = net + mlp2(p, 'update.c1.0', 'update.c1.2',
                     mask_ix * neighbor(net, ix, gp[0]))
    net = net + mlp2(p, 'update.c2.0', 'update.c2.2',
                     mask_jx * neighbor(net, jx, gp[1]))

    if gather_pairs is not None:
        # pair-blocked tables (DeviceVO): pair_ids == repeat(arange(GP), M)
        # and kk_ids == psl[g]*M + m, so both aggregations run at pair
        # granularity — agg_ij with NO scatter at all, agg_kk with GP-row
        # scatters instead of E fine-grained ones (serial-loop territory
        # on TPU)
        from .blocks import soft_agg_ij_pairs, soft_agg_kk_pairs
        Mg = gather_pairs[2]
        GP = net.shape[0] // Mg
        net3 = net.reshape(GP, Mg, DIM)
        mask3 = edge_mask.reshape(GP, Mg)
        psl = kk_ids.reshape(GP, Mg)[:, 0] // Mg
        net = net + soft_agg_kk_pairs(p, 'update.agg_kk', net3, psl, mask3,
                                      num_segments_kk // Mg)
        net3 = net.reshape(GP, Mg, DIM)
        net = net + soft_agg_ij_pairs(p, 'update.agg_ij', net3, mask3)
    else:
        net = net + soft_agg(p, 'update.agg_kk', net, kk_ids,
                             num_segments_kk, mask=edge_mask)
        net = net + soft_agg(p, 'update.agg_ij', net, pair_ids,
                             num_segments_ij, mask=edge_mask)

    net = layer_norm(p, 'update.gru.0', net)
    net = gated_residual(p, 'update.gru.1', net)
    net = layer_norm(p, 'update.gru.2', net)
    net = gated_residual(p, 'update.gru.3', net)

    from .blocks import grad_clip
    # heads carry the reference's backward gradient clamp (blocks.py:74-89)
    delta = grad_clip(
        linear(p, 'update.d.1', jax.nn.relu(net)).astype(jnp.float32))
    weight = jax.nn.sigmoid(grad_clip(
        linear(p, 'update.w.1', jax.nn.relu(net)).astype(jnp.float32)))

    return net, delta, weight


# ---------------------------------------------------------------------------
# initialization (name/shape-compatible with torch checkpoints)
# ---------------------------------------------------------------------------

def init_vonet_params(seed=0):
    rng = np.random.RandomState(seed)
    p = {}
    p.update(init_encoder_params(rng, 'patchify.fnet', 128))
    p.update(init_encoder_params(rng, 'patchify.inet', DIM))

    init_linear(rng, p, 'update.c1.0', DIM, DIM)
    init_linear(rng, p, 'update.c1.2', DIM, DIM)
    init_linear(rng, p, 'update.c2.0', DIM, DIM)
    init_linear(rng, p, 'update.c2.2', DIM, DIM)
    init_layer_norm(p, 'update.norm', DIM)
    for agg in ('update.agg_kk', 'update.agg_ij'):
        init_linear(rng, p, agg + '.f', DIM, DIM)
        init_linear(rng, p, agg + '.g', DIM, DIM)
        init_linear(rng, p, agg + '.h', DIM, DIM)
    init_layer_norm(p, 'update.gru.0', DIM)
    init_linear(rng, p, 'update.gru.1.gate.0', DIM, DIM)
    init_linear(rng, p, 'update.gru.1.res.0', DIM, DIM)
    init_linear(rng, p, 'update.gru.1.res.2', DIM, DIM)
    init_layer_norm(p, 'update.gru.2', DIM)
    init_linear(rng, p, 'update.gru.3.gate.0', DIM, DIM)
    init_linear(rng, p, 'update.gru.3.res.0', DIM, DIM)
    init_linear(rng, p, 'update.gru.3.res.2', DIM, DIM)
    init_linear(rng, p, 'update.corr.0', CORR_IN, DIM)
    init_linear(rng, p, 'update.corr.2', DIM, DIM)
    init_layer_norm(p, 'update.corr.3', DIM)
    init_linear(rng, p, 'update.corr.5', DIM, DIM)
    init_linear(rng, p, 'update.d.1', DIM, 2)
    init_linear(rng, p, 'update.w.1', DIM, 2)
    return p
