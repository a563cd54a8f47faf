"""Distillation-loss parity vs torch oracles.

The incremental losses are mAP-critical (SURVEY.md §7 hard part 3), so
each formula is re-derived here in torch (CPU) directly from the
reference's math — distillation/distillation.py and
roi_heads/box_head/loss.py — and compared against our jnp
implementations on random inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from abr_iod_tpu.distillation import losses as D
from abr_iod_tpu.models.losses import roi_box_loss


def test_uce_roi_distillation_matches_torch(rng):
    n, c_old, c_new = 32, 16, 21
    soften = rng.randn(n, c_old).astype(np.float32)
    target = rng.randn(n, c_new).astype(np.float32)
    sb = rng.randn(n, c_old, 4).astype(np.float32)
    tb = rng.randn(n, c_new, 4).astype(np.float32)

    got = float(D.roi_distillation_losses(
        jnp.asarray(soften), jnp.asarray(sb), jnp.asarray(target), jnp.asarray(tb),
        dist="id",
    ))

    ts, tt = torch.tensor(soften), torch.tensor(target)
    num_cat = c_old
    tot = c_new
    new_bkg_idx = torch.tensor([0] + list(range(num_cat, tot)))
    den = torch.logsumexp(tt, dim=1)
    outputs_no_bgk = tt[:, 1:-(tot - num_cat)] - den.unsqueeze(1)
    outputs_bkg = torch.logsumexp(torch.index_select(tt, 1, new_bkg_idx), dim=1) - den
    labels = torch.softmax(ts, dim=1)
    loss = (labels[:, 0] * outputs_bkg + (labels[:, 1:] * outputs_no_bgk).sum(1)) / c_old
    cls = -loss.mean()
    msb = torch.tensor(sb)[:, 1:, :]
    mtb = torch.tensor(tb)[:, 1:c_old, :]
    bbox = ((mtb - msb) ** 2).sum(2).mean(1).mean(0)
    expect = float(cls + bbox)
    np.testing.assert_allclose(got, expect, rtol=1e-4)


def test_l2_roi_distillation_matches_torch(rng):
    n, c_old, c_new = 16, 11, 16
    soften = rng.randn(n, c_old).astype(np.float32)
    target = rng.randn(n, c_new).astype(np.float32)
    sb = rng.randn(n, c_old, 4).astype(np.float32)
    tb = rng.randn(n, c_new, 4).astype(np.float32)
    got = float(D.roi_distillation_losses(
        jnp.asarray(soften), jnp.asarray(sb), jnp.asarray(target), jnp.asarray(tb),
        dist="l2",
    ))
    ts, tt = torch.tensor(soften), torch.tensor(target)
    ns = ts - ts.mean(dim=1, keepdim=True)
    nt = tt - tt.mean(dim=1, keepdim=True)
    cls = ((ns - nt[:, :c_old]) ** 2).mean(1).mean(0)
    msb = torch.tensor(sb)[:, 1:, :]
    mtb = torch.tensor(tb)[:, 1:c_old, :]
    bbox = ((mtb - msb) ** 2).sum(2).mean(1).mean(0)
    np.testing.assert_allclose(got, float(cls + bbox), rtol=1e-4)


def test_ard_matches_torch(rng):
    n, p, c = 24, 7, 32
    fs = rng.randn(n, p, p, c).astype(np.float32)
    ft = rng.randn(n, p, p, c).astype(np.float32)
    gamma = 0.7
    got = float(D.attentive_roi_distillation_loss(
        jnp.asarray(fs), jnp.asarray(ft), gamma=gamma
    ))

    # torch oracle in NCHW like the reference (distillation.py:86-130)
    tfs = torch.tensor(fs).permute(0, 3, 1, 2)
    tft = torch.tensor(ft).permute(0, 3, 1, 2)

    def activation_at(f, temp=2):
        n_, c_, h_, w_ = f.shape
        fea = f.abs().pow(temp).mean(dim=1, keepdim=True)
        return (h_ * w_ * torch.softmax(fea.view(n_, -1), dim=1)).view(n_, h_, w_)

    s_att_t = activation_at(tfs)  # reference's swapped naming
    s_att_s = activation_at(tft)
    pad = torch.nn.functional.l1_loss(s_att_s, s_att_t)
    st = s_att_t.unsqueeze(1)
    afd = torch.nn.functional.mse_loss(tfs * st.sqrt(), tft * st.sqrt())
    np.testing.assert_allclose(got, float(afd + gamma * pad), rtol=1e-4)


def test_rpn_distill_matches_torch(rng):
    b, h, w, a = 2, 6, 8, 5
    os_ = rng.randn(b, h, w, a).astype(np.float32)
    ot = rng.randn(b, h, w, a).astype(np.float32)
    rs = rng.randn(b, h, w, 4 * a).astype(np.float32)
    rt = rng.randn(b, h, w, 4 * a).astype(np.float32)
    got = float(D.rpn_distillation_loss(
        jnp.asarray(os_), jnp.asarray(rs), jnp.asarray(ot), jnp.asarray(rt), 0.1
    ))

    # torch oracle (distillation.py:18-83); our layout [B,H,W,A] flattens in
    # the same (H,W,A) order as permute_and_flatten
    t_os, t_ot = torch.tensor(os_), torch.tensor(ot)
    diff = t_os - t_ot
    cls = torch.clamp(diff, min=0).pow(2).mean()
    diff_f = diff.reshape(b, -1, 1)
    m = (diff_f > 0.1).float()
    rs_f = torch.tensor(rs).reshape(b, -1, 4)
    rt_f = torch.tensor(rt).reshape(b, -1, 4)
    bbs = ((rs_f * m - rt_f * m) ** 2).sum(2).mean(1).mean(0)
    np.testing.assert_allclose(got, float(cls + bbs), rtol=1e-4)


def test_inclusive_cls_loss_matches_torch(rng):
    b, s, c, n_old = 2, 16, 21, 15
    logits = rng.randn(b, s, c).astype(np.float32)
    labels = rng.choice([0] + list(range(n_old + 1, c)), size=(b, s)).astype(np.int32)
    got, _ = roi_box_loss(
        jnp.asarray(logits), jnp.zeros((b, s, 4 * c)), jnp.asarray(labels),
        jnp.zeros((b, s, 4)), jnp.ones((b, s), bool),
        dist_type="id", n_old_classes=n_old,
    )
    # torch oracle (box_head/loss.py:151-159)
    cl = torch.tensor(logits).reshape(-1, c)
    lab = torch.tensor(labels.reshape(-1).astype(np.int64))
    outputs = torch.zeros_like(cl)
    den = torch.logsumexp(cl, dim=1)
    outputs[:, 0] = torch.logsumexp(cl[:, 0:n_old + 1], dim=1) - den
    outputs[:, n_old + 1:] = cl[:, n_old + 1:] - den.unsqueeze(1)
    expect = torch.nn.functional.nll_loss(outputs, lab)
    np.testing.assert_allclose(float(got), float(expect), rtol=1e-4)
