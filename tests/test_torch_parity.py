"""Checkpoint-conversion parity: JAX model vs torch mirror, same weights.

Builds torch modules with the reference's exact state_dict structure
(dpvo/extractor.py:200-264, net.py:27-92), runs both on the same input, and
checks outputs match. This validates the converter's layout rules and the
functional reimplementation in one shot — so a real dpvo.pth loads
correctly.
"""
import numpy as np
import pytest

torch = pytest.importorskip('torch')
import torch.nn as nn  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from dpvo_tpu.models.checkpoint import convert_torch_state_dict  # noqa: E402
from dpvo_tpu.models.extractor import basic_encoder4  # noqa: E402
from dpvo_tpu.models.vonet import VONetParams, update_op  # noqa: E402

DIM = 384


class TorchResidualBlock(nn.Module):
    def __init__(self, in_planes, planes, norm_fn='instance', stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, padding=1, stride=stride)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1)
        self.relu = nn.ReLU(inplace=True)
        if norm_fn == 'instance':
            self.norm1 = nn.InstanceNorm2d(planes)
            self.norm2 = nn.InstanceNorm2d(planes)
            if stride != 1:
                self.norm3 = nn.InstanceNorm2d(planes)
        else:
            self.norm1 = nn.Sequential()
            self.norm2 = nn.Sequential()
            if stride != 1:
                self.norm3 = nn.Sequential()
        if stride == 1:
            self.downsample = None
        else:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, stride=stride), self.norm3)

    def forward(self, x):
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return self.relu(x + y)


class TorchBasicEncoder4(nn.Module):
    def __init__(self, output_dim=128, norm_fn='instance'):
        super().__init__()
        D = 32
        if norm_fn == 'instance':
            self.norm1 = nn.InstanceNorm2d(D)
        else:
            self.norm1 = nn.Sequential()
        self.conv1 = nn.Conv2d(3, D, 7, stride=2, padding=3)
        self.relu1 = nn.ReLU(inplace=True)
        self.layer1 = nn.Sequential(TorchResidualBlock(D, D, norm_fn, 1),
                                    TorchResidualBlock(D, D, norm_fn, 1))
        self.layer2 = nn.Sequential(TorchResidualBlock(D, 2 * D, norm_fn, 2),
                                    TorchResidualBlock(2 * D, 2 * D, norm_fn, 1))
        self.conv2 = nn.Conv2d(2 * D, output_dim, 1)

    def forward(self, x):
        x = self.relu1(self.norm1(self.conv1(x)))
        x = self.layer1(x)
        x = self.layer2(x)
        return self.conv2(x)


def test_encoder_parity():
    torch.manual_seed(0)
    enc = TorchBasicEncoder4(128, 'instance').eval()
    sd = {f'fnet.{k}': v for k, v in enc.state_dict().items()}
    params = VONetParams.from_f32(convert_torch_state_dict(sd))

    x = np.random.RandomState(1).randn(1, 3, 64, 96).astype(np.float32)
    with torch.no_grad():
        ref = enc(torch.from_numpy(x)).numpy()          # (1, 128, 16, 24)

    out = basic_encoder4(params.f32, 'fnet',
                         jnp.asarray(x.transpose(0, 2, 3, 1)), 'instance')
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=1e-3)


class TorchGatedResidual(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.gate = nn.Sequential(nn.Linear(dim, dim), nn.Sigmoid())
        self.res = nn.Sequential(nn.Linear(dim, dim), nn.ReLU(inplace=True),
                                 nn.Linear(dim, dim))

    def forward(self, x):
        return x + self.gate(x) * self.res(x)


class TorchSoftAgg(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.f = nn.Linear(dim, dim)
        self.g = nn.Linear(dim, dim)
        self.h = nn.Linear(dim, dim)

    def forward(self, x, ix):
        # scatter_softmax + scatter_sum via dense ops (test-only, small E)
        _, jx = torch.unique(ix, return_inverse=True)
        G = self.g(x)
        n = int(jx.max()) + 1
        w = torch.zeros_like(G)
        for s in range(n):
            m = jx == s
            w[m] = torch.softmax(G[m], dim=0)
        y = torch.zeros(n, x.shape[1])
        y.index_add_(0, jx, self.f(x) * w)
        return self.h(y)[jx]


class TorchUpdate(nn.Module):
    """Mirror of the reference Update operator (dpvo/net.py:27-92)."""

    def __init__(self, p=3):
        super().__init__()
        self.c1 = nn.Sequential(nn.Linear(DIM, DIM), nn.ReLU(inplace=True),
                                nn.Linear(DIM, DIM))
        self.c2 = nn.Sequential(nn.Linear(DIM, DIM), nn.ReLU(inplace=True),
                                nn.Linear(DIM, DIM))
        self.norm = nn.LayerNorm(DIM, eps=1e-3)
        self.agg_kk = TorchSoftAgg(DIM)
        self.agg_ij = TorchSoftAgg(DIM)
        self.gru = nn.Sequential(
            nn.LayerNorm(DIM, eps=1e-3), TorchGatedResidual(DIM),
            nn.LayerNorm(DIM, eps=1e-3), TorchGatedResidual(DIM))
        self.corr = nn.Sequential(
            nn.Linear(2 * 49 * p * p, DIM), nn.ReLU(inplace=True),
            nn.Linear(DIM, DIM), nn.LayerNorm(DIM, eps=1e-3),
            nn.ReLU(inplace=True), nn.Linear(DIM, DIM))
        self.d = nn.Sequential(nn.ReLU(inplace=False), nn.Linear(DIM, 2))
        self.w = nn.Sequential(nn.ReLU(inplace=False), nn.Linear(DIM, 2),
                               nn.Sigmoid())

    def forward(self, net, inp, corr, ixn, jxn, kk, pair):
        net = net + inp + self.corr(corr)
        net = self.norm(net)
        mask_ix = (ixn >= 0).float().reshape(-1, 1)
        mask_jx = (jxn >= 0).float().reshape(-1, 1)
        net = net + self.c1(mask_ix * net[ixn.clamp(min=0)])
        net = net + self.c2(mask_jx * net[jxn.clamp(min=0)])
        net = net + self.agg_kk(net, kk)
        net = net + self.agg_ij(net, pair)
        net = self.gru(net)
        return net, self.d(net), self.w(net)


def test_update_op_parity():
    torch.manual_seed(0)
    upd = TorchUpdate().eval().float()
    sd = {f'update.{k}': v for k, v in upd.state_dict().items()}
    params = VONetParams.from_f32(convert_torch_state_dict(sd))

    E = 24
    rng = np.random.RandomState(2)
    net = rng.randn(E, DIM).astype(np.float32) * 0.1
    inp = rng.randn(E, DIM).astype(np.float32) * 0.1
    corr = rng.randn(E, 2 * 49 * 9).astype(np.float32) * 0.1
    kk = rng.randint(0, 6, E)
    ii = rng.randint(0, 3, E)
    jj = rng.randint(0, 3, E)

    # neighbors (host rule used by the runtime)
    ix = np.full(E, -1)
    jx = np.full(E, -1)
    order = np.lexsort((np.arange(E), jj, kk))
    sk = kk[order]
    same = sk[1:] == sk[:-1]
    ix[order[1:][same]] = order[:-1][same]
    jx[order[:-1][same]] = order[1:][same]

    with torch.no_grad():
        ref_net, ref_d, ref_w = upd(
            torch.from_numpy(net), torch.from_numpy(inp),
            torch.from_numpy(corr), torch.from_numpy(ix),
            torch.from_numpy(jx), torch.from_numpy(kk),
            torch.from_numpy(ii * 12345 + jj))

    _, kk_ids = np.unique(kk, return_inverse=True)
    _, pair_ids = np.unique(ii * 12345 + jj, return_inverse=True)
    out_net, out_d, out_w = update_op(
        params, jnp.asarray(net), jnp.asarray(inp), jnp.asarray(corr),
        jnp.asarray(ix.astype(np.int32)), jnp.asarray(jx.astype(np.int32)),
        jnp.asarray(kk_ids.astype(np.int32)),
        jnp.asarray(pair_ids.astype(np.int32)),
        num_segments=E, edge_mask=jnp.ones(E, bool), mixed_precision=False)

    np.testing.assert_allclose(np.asarray(out_net), ref_net.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_d), ref_d.numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_w), ref_w.numpy(), atol=2e-4)


# ---------------------------------------------------------------------------
# correlation op: pure-torch mirror of the reference CUDA kernel
# (dpvo/altcorr/correlation_kernel.cu:83-232)
# ---------------------------------------------------------------------------

def torch_corr(gmap_t, fmap_t, coords_t, kk_t, jj_t, radius=3):
    """corr[e, dx, dy, py, px] = bilinear_4tap( sum_c g[kk[e],c,py,px] *
    f[jj[e], c, y0+dy', x0+dx'] ) with out-of-image taps zeroed.

    gmap_t (Ng, C, P, P); fmap_t (F, C, H, W); coords_t (E, 2, P, P)."""
    E, _, P, _ = coords_t.shape
    D = 2 * radius + 2
    d = 2 * radius + 1
    H, W = fmap_t.shape[2], fmap_t.shape[3]

    x0 = torch.floor(coords_t[:, 0]).long() - radius       # (E, P, P)
    y0 = torch.floor(coords_t[:, 1]).long() - radius
    fx = (coords_t[:, 0] - torch.floor(coords_t[:, 0]))    # (E, P, P)
    fy = (coords_t[:, 1] - torch.floor(coords_t[:, 1]))

    ar = torch.arange(D)
    yi = y0[..., None] + ar                                # (E, P, P, D)
    xj = x0[..., None] + ar
    valid = ((yi[..., :, None] >= 0) & (yi[..., :, None] < H) &
             (xj[..., None, :] >= 0) & (xj[..., None, :] < W))
    yc = yi.clamp(0, H - 1)
    xc = xj.clamp(0, W - 1)

    g = gmap_t[kk_t]                                       # (E, C, P, P)
    f = fmap_t[jj_t]                                       # (E, C, H, W)
    # windows via advanced indexing: (E, P, P, D, D, C)
    win = f[torch.arange(E)[:, None, None, None, None],
            :, yc[:, :, :, :, None], xc[:, :, :, None, :]]
    win = win * valid[..., None]
    c = torch.einsum('ecij,eijklc->eijkl', g.double(), win.double())
    out = ((1 - fx)[..., None, None] * (1 - fy)[..., None, None] *
           c[..., :d, :d] +
           fx[..., None, None] * (1 - fy)[..., None, None] * c[..., :d, 1:] +
           (1 - fx)[..., None, None] * fy[..., None, None] * c[..., 1:, :d] +
           fx[..., None, None] * fy[..., None, None] * c[..., 1:, 1:])
    # (E, py, px, dy, dx) -> (E, dx, dy, py, px)
    return out.permute(0, 4, 3, 1, 2).float()


def test_corr_torch_parity():
    """Cross-framework certification of the correlation op, incl. borders."""
    from dpvo_tpu.ops.corr import corr as corr_xla

    rng = np.random.RandomState(5)
    P, C, H, W, F, Ng, E = 3, 32, 40, 56, 3, 24, 64
    gmap = rng.randn(Ng, P, P, C).astype(np.float32)
    fmap = rng.randn(F, H, W, C).astype(np.float32)
    cx = np.concatenate([rng.uniform(5, W - 6, E - 16),
                         rng.uniform(-2, 4, 8), rng.uniform(W - 4, W + 2, 8)])
    cy = np.concatenate([rng.uniform(5, H - 6, E - 16),
                         rng.uniform(H - 4, H + 2, 8), rng.uniform(-2, 4, 8)])
    off = np.linspace(-1.0, 1.0, P)
    gx = cx[:, None, None] + off[None, None, :]
    gy = cy[:, None, None] + off[None, :, None]
    coords = np.stack([np.broadcast_to(gx, (E, P, P)),
                       np.broadcast_to(gy, (E, P, P))], -1).astype(np.float32)
    kk = rng.randint(0, Ng, E)
    jj = rng.randint(0, F, E)

    ours = np.asarray(corr_xla(jnp.asarray(gmap), jnp.asarray(fmap),
                               jnp.asarray(coords),
                               jnp.asarray(kk.astype(np.int32)),
                               jnp.asarray(jj.astype(np.int32))))

    with torch.no_grad():
        ref = torch_corr(
            torch.from_numpy(gmap.transpose(0, 3, 1, 2)),
            torch.from_numpy(fmap.transpose(0, 3, 1, 2)),
            torch.from_numpy(coords.transpose(0, 3, 1, 2)),
            torch.from_numpy(kk), torch.from_numpy(jj)).numpy()

    np.testing.assert_allclose(ours, ref, atol=5e-3, rtol=1e-4)


def test_frame_pipeline_parity():
    """One full tracked step through BOTH stacks: encoders -> patch gather ->
    correlation -> update operator, same torch weights (VERDICT round-1 #4a;
    the BA stage is certified separately by tests/test_ba golden cases and
    the oracle-ATE runtime test)."""
    from dpvo_tpu.models.vonet import patchify_frame
    from dpvo_tpu.ops.corr import corr as corr_xla

    torch.manual_seed(3)
    fnet = TorchBasicEncoder4(128, 'instance').eval()
    inet = TorchBasicEncoder4(DIM, 'none').eval()
    upd = TorchUpdate().eval().float()
    sd = {}
    sd.update({f'patchify.fnet.{k}': v for k, v in fnet.state_dict().items()})
    sd.update({f'patchify.inet.{k}': v for k, v in inet.state_dict().items()})
    sd.update({f'update.{k}': v for k, v in upd.state_dict().items()})
    params = VONetParams.from_f32(convert_torch_state_dict(sd))

    rng = np.random.RandomState(9)
    H, W, M = 64, 96, 12
    img = (2.0 * (rng.randint(0, 255, (H, W, 3)) / 255.0) - 0.5
           ).astype(np.float32)
    # integer centroids: patch extraction is then an exact gather
    coords = np.stack([rng.randint(2, W // 4 - 2, M),
                       rng.randint(2, H // 4 - 2, M)], -1).astype(np.float32)

    # --- JAX path ---
    feats = patchify_frame(params, jnp.asarray(img), jnp.asarray(coords),
                           mixed_precision=False)
    E = M
    kk = np.arange(M)
    jj = np.zeros(M, np.int64)
    tgt = np.stack([
        coords[:, 0, None, None] + np.linspace(-1, 1, 3)[None, None, :]
        + rng.uniform(-.4, .4, (M, 3, 3)),
        coords[:, 1, None, None] + np.linspace(-1, 1, 3)[None, :, None]
        + rng.uniform(-.4, .4, (M, 3, 3))], -1).astype(np.float32)
    c1 = corr_xla(feats['gmap'], feats['fmap1'][None], jnp.asarray(tgt),
                  jnp.asarray(kk.astype(np.int32)),
                  jnp.asarray(jj.astype(np.int32)))
    corr_feat_j = jnp.concatenate(
        [c1.reshape(E, -1), jnp.zeros((E, 49 * 9))], axis=1)

    net0 = rng.randn(E, DIM).astype(np.float32) * 0.1
    neg = np.full(E, -1, np.int32)
    ids = np.arange(E, dtype=np.int32)
    out_net, out_d, out_w = update_op(
        params, jnp.asarray(net0), feats['imap'].astype(jnp.float32),
        corr_feat_j.astype(jnp.float32),
        jnp.asarray(neg), jnp.asarray(neg), jnp.asarray(ids),
        jnp.asarray(np.zeros(E, np.int32)),
        num_segments=E, edge_mask=jnp.ones(E, bool), mixed_precision=False)

    # --- torch path ---
    with torch.no_grad():
        x = torch.from_numpy(img.transpose(2, 0, 1))[None]
        fmap_t = fnet(x) / 4.0                      # (1, 128, H/4, W/4)
        imap_t = inet(x) / 4.0                      # (1, 384, H/4, W/4)
        ix = coords.astype(np.int64)
        gm, im = [], []
        for m in range(M):
            cxm, cym = ix[m, 0], ix[m, 1]
            gm.append(fmap_t[0, :, cym - 1:cym + 2, cxm - 1:cxm + 2])
            im.append(imap_t[0, :, cym, cxm])
        gmap_t = torch.stack(gm)                    # (M, 128, 3, 3)
        imap_vec = torch.stack(im)                  # (M, 384)
        ct = torch_corr(gmap_t, fmap_t, torch.from_numpy(
            tgt.transpose(0, 3, 1, 2)), torch.from_numpy(kk),
            torch.from_numpy(jj))
        corr_feat_t = torch.cat(
            [ct.reshape(E, -1), torch.zeros(E, 49 * 9)], dim=1)
        ref_net, ref_d, ref_w = upd(
            torch.from_numpy(net0), imap_vec, corr_feat_t,
            torch.from_numpy(neg.astype(np.int64)),
            torch.from_numpy(neg.astype(np.int64)),
            torch.from_numpy(kk), torch.from_numpy(jj))

    np.testing.assert_allclose(np.asarray(out_d), ref_d.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_w), ref_w.numpy(),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(out_net), ref_net.numpy(),
                               atol=5e-3, rtol=1e-3)


def test_fused_encoder_matches_separate():
    """basic_encoder4_fused must be bitwise-equivalent to the two separate
    encoder passes (block-diagonal weights add exact zeros; the instance
    norm covers the fnet half only)."""
    import jax.numpy as jnp
    from dpvo_tpu.models.extractor import (basic_encoder4,
                                           basic_encoder4_fused,
                                           init_encoder_params)

    rng = np.random.RandomState(0)
    p = {}
    p.update(init_encoder_params(rng, 'patchify.fnet', 128))
    p.update(init_encoder_params(rng, 'patchify.inet', 384))
    p = {k: jnp.asarray(v) for k, v in p.items()}
    x = jnp.asarray(rng.randn(1, 32, 48, 3).astype(np.float32))

    fa = basic_encoder4(p, 'patchify.fnet', x, 'instance')
    fb = basic_encoder4(p, 'patchify.inet', x, 'none')
    ga, gb = basic_encoder4_fused(p, 'patchify.fnet', 'patchify.inet', x)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(fa),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(fb),
                               rtol=1e-5, atol=1e-5)


def test_pair_blocked_aggregation_matches_segment_path():
    """update_op's pair-granular SoftAgg fast path (gather_pairs given)
    must reproduce the generic segment-softmax path bit-for-bit-ish on the
    same pair-blocked tables (the DeviceVO contract: pair_ids =
    repeat(arange(GP), M), kk_ids = psl*M + m)."""
    import jax.numpy as jnp
    from dpvo_tpu.models.vonet import DIM, init_vonet_params, update_op
    from dpvo_tpu.models.vonet import VONetParams

    rng = np.random.RandomState(5)
    GP, M, pmem = 12, 4, 6
    E = GP * M
    raw = {k: jnp.asarray(v) for k, v in init_vonet_params(0).items()}
    params = VONetParams(
        f32=raw, bf16={k: v.astype(jnp.bfloat16) for k, v in raw.items()})

    net = jnp.asarray(rng.randn(E, DIM).astype(np.float32))
    inp = jnp.asarray(rng.randn(E, DIM).astype(np.float32))
    corr = jnp.asarray(rng.randn(E, 2 * 49 * 9).astype(np.float32))

    psl = rng.randint(0, pmem, GP).astype(np.int32)     # shared slots
    mar = np.arange(M, dtype=np.int32)
    kk_ids = (psl[:, None] * M + mar[None, :]).reshape(E)
    pair_ids = np.repeat(np.arange(GP, dtype=np.int32), M)
    ix_pair = rng.randint(-1, GP, GP).astype(np.int32)
    jx_pair = rng.randint(-1, GP, GP).astype(np.int32)
    ix_e = np.where(ix_pair[:, None] >= 0,
                    ix_pair[:, None] * M + mar[None, :], -1).reshape(E)
    jx_e = np.where(jx_pair[:, None] >= 0,
                    jx_pair[:, None] * M + mar[None, :], -1).reshape(E)
    mask = rng.rand(GP) > 0.2                            # whole-pair masks
    edge_mask = np.repeat(mask, M)

    args = (params, net, inp, corr, jnp.asarray(ix_e), jnp.asarray(jx_e),
            jnp.asarray(kk_ids), jnp.asarray(pair_ids))
    kw = dict(num_segments=E, edge_mask=jnp.asarray(edge_mask),
              mixed_precision=False, num_segments_kk=pmem * M,
              num_segments_ij=GP)

    n0, d0, w0 = update_op(*args, **kw)
    n1, d1, w1 = update_op(*args, **kw,
                           gather_pairs=(jnp.asarray(ix_pair),
                                         jnp.asarray(jx_pair), M))
    np.testing.assert_allclose(np.asarray(n1), np.asarray(n0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w0),
                               rtol=2e-4, atol=2e-4)
