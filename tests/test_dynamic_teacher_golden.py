"""Full DynamicTeacher forward golden vs a torch restatement of the
reference (dynamic_teacher.py:16-301): LabelEncoder -> canoni/student
projections -> inside-GT masks -> mask pooling -> block-diagonal
MultiheadAttention (stuGuided) -> decoupled rendering with context fusion ->
refinement. Weights are copied from our Flax init into the torch oracle and
the final teacher feature pyramids compared (VERDICT r1 #2: extend the
LabelEncoder-golden technique to the whole teacher)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF

from test_label_encoder_parity import (
    TorchLabelEncoder,
    _copy_stn,
    _copy_token_mlp,
)

from lgd_tpu.models.lgd.dynamic_teacher import DynamicTeacher
from lgd_tpu.models.lgd.label_encoder import encode_descriptors
from lgd_tpu.structures import BatchedInstances

C, HEADS = 256, 8


class TorchTeacherTail(nn.Module):
    """Everything after the label encoder, restated per the reference."""

    def __init__(self):
        super().__init__()
        self.label_encoder_ = TorchLabelEncoder()
        self.canoni_proj_1D = nn.Linear(C, C)
        self.student_proj_2D = nn.Conv2d(C, C, 3, 1, 1)
        self.local_inst_proj_2D = nn.Conv2d(C, C, 3, 1, 1)
        self.global_ctx_proj_1D = nn.Linear(C, C)
        self.local_inst_proj_1D = nn.Linear(C, C)
        self.refine = nn.ModuleList([nn.Conv2d(C, C, 3, 1, 1)
                                     for _ in range(3)])
        self.mha = nn.MultiheadAttention(C, HEADS)

    @staticmethod
    def _gn(x):  # GroupNorm(1, C, affine=False)
        return TF.group_norm(x, 1)

    @staticmethod
    def _ln(x):  # LayerNorm([C], affine=False)
        return TF.layer_norm(x, (C,))

    def forward(self, desc_tokens, nr_tokens, boxlists, padded_hw,
                stu_feats):
        """desc_tokens: (T, 84); nr_tokens: per-image token counts (incl.
        ctx, last per image); boxlists: (T, 4) absolute clamped boxes;
        stu_feats: list of (B, C, hi, wi)."""
        H, W = padded_hw
        B = len(nr_tokens)
        x = self.label_encoder_(desc_tokens.unsqueeze(-1), nr_tokens)
        canoni = TF.relu(self._ln(self.canoni_proj_1D(x)))  # (T, C)

        proj_feats = [TF.relu(self._gn(self.student_proj_2D(f)))
                      for f in stu_feats]

        # inside-GT masks per level (reference utils.py:53-89 formula)
        def inside(box, hi, wi):
            ry, rx = hi / H, wi / W
            x1, y1, x2, y2 = (box[0] * rx, box[1] * ry,
                              box[2] * rx, box[3] * ry)
            xc, yc = (x1 + x2) / 2, (y1 + y2) / 2
            w = max(x2 - x1, 1e-6)
            h = max(y2 - y1, 1e-6)
            ys = np.arange(hi)
            xs = np.arange(wi)
            iy = np.abs(yc - ys) / h <= 0.5
            ix = np.abs(xc - xs) / w <= 0.5
            return (iy[:, None] & ix[None, :]).reshape(-1)

        masks = []  # per level: (T, hi*wi)
        for f in stu_feats:
            hi, wi = f.shape[-2:]
            masks.append(torch.tensor(np.stack([
                inside(b, hi, wi) for b in boxlists
            ]).astype(np.float32)))

        # mask pooling (aggregate_per_level) per level -> (T, C)
        offs = np.concatenate([[0], np.cumsum(nr_tokens)])
        stu_embeds = []
        for f, m in zip(proj_feats, masks):
            flat = f.flatten(2)  # (B, C, hw)
            rows = []
            for b in range(B):
                mb = m[offs[b]: offs[b + 1]]
                pool = torch.mm(mb, flat[b].T)
                norm = torch.clamp(mb.sum(-1), min=1.0)
                rows.append(pool / norm[:, None])
            stu_embeds.append(torch.cat(rows, 0))

        img_of = torch.tensor(sum(([i] * n for i, n in enumerate(nr_tokens)),
                                  []))
        attn_mask = img_of[:, None] != img_of[None, :]
        canoni_u = canoni.unsqueeze(1)
        outs = [self.mha(e.unsqueeze(1), canoni_u, canoni_u,
                         attn_mask=attn_mask)[0].squeeze(1)
                for e in stu_embeds]  # stuGuided

        # rendering with context (last token per image) + refinement
        tea = []
        for out, m, f in zip(outs, masks, stu_feats):
            hi, wi = f.shape[-2:]
            maps, ctxs = [], []
            for b in range(B):
                rows = out[offs[b]: offs[b + 1]]
                mb = m[offs[b]: offs[b + 1]]
                inst = self.local_inst_proj_1D(rows[:-1])
                maps.append(torch.mm(inst.T, mb[:-1]))  # (C, hw)
                ctxs.append(rows[-1])
            fmap = torch.stack(maps).reshape(B, C, hi, wi)
            fmap = self.local_inst_proj_2D(fmap)
            ctx = self.global_ctx_proj_1D(torch.stack(ctxs))
            fmap = TF.relu(fmap + ctx[:, :, None, None])
            fmap = TF.relu(self._gn(self.refine[0](fmap)))
            fmap = TF.relu(self._gn(self.refine[1](fmap)))
            fmap = self._gn(self.refine[2](fmap))
            tea.append(fmap)
        return tea


def _copy_linear(dst, tmod):
    dst["kernel"] = np.asarray(tmod.weight.detach().numpy().T)
    dst["bias"] = np.asarray(tmod.bias.detach().numpy())


def _copy_conv(dst, tmod):
    dst["kernel"] = np.asarray(
        tmod.weight.detach().numpy().transpose(2, 3, 1, 0))
    dst["bias"] = np.asarray(tmod.bias.detach().numpy())


def copy_teacher_weights(p, oracle):
    """Copy a TorchTeacherTail's weights into our DynamicTeacher param tree
    (shared with the composed full-system golden, test_full_system_golden)."""
    le = p["label_encoder_"]
    _copy_stn(le["stn_desc"], oracle.label_encoder_.stn_desc)
    _copy_stn(le["stn_feat"], oracle.label_encoder_.stn_feat)
    for name in ("conv1", "conv2", "conv3", "conv4"):
        _copy_token_mlp(le[name], getattr(oracle.label_encoder_, name))
    _copy_linear(p["canoni_proj_1D"]["linear"], oracle.canoni_proj_1D)
    _copy_conv(p["student_proj_2D"]["conv"], oracle.student_proj_2D)
    _copy_conv(p["local_inst_proj_2D"], oracle.local_inst_proj_2D)
    _copy_linear(p["global_ctx_proj_1D"], oracle.global_ctx_proj_1D)
    _copy_linear(p["local_inst_proj_1D"], oracle.local_inst_proj_1D)
    for i in range(3):
        _copy_conv(p[f"refine_{i + 1}"]["conv"], oracle.refine[i])
    C_ = oracle.canoni_proj_1D.in_features
    w_in = oracle.mha.in_proj_weight.detach().numpy()
    b_in = oracle.mha.in_proj_bias.detach().numpy()
    mha = p["multi_head_attn"]
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        mha[name]["kernel"] = w_in[i * C_:(i + 1) * C_].T.copy()
        mha[name]["bias"] = b_in[i * C_:(i + 1) * C_].copy()
    _copy_linear(mha["out_proj"], oracle.mha.out_proj)


def test_dynamic_teacher_matches_torch_reference():
    torch.manual_seed(0)
    oracle = TorchTeacherTail().eval()
    rng = np.random.RandomState(0)

    H, W = 64, 64
    levels = {"p3": (8, 8), "p4": (4, 4)}
    B, cap = 2, 4
    boxes1 = np.array([[4, 6, 30, 40], [20, 10, 60, 62]], np.float32)
    cls1 = np.array([3, 77])
    boxes2 = np.array([[2, 2, 50, 30], [10, 20, 40, 60], [0, 0, 63, 63]],
                      np.float32)
    cls2 = np.array([0, 15, 42])
    gt = BatchedInstances.from_lists([boxes1, boxes2], [cls1, cls2],
                                     capacity=cap)
    stu = {k: rng.randn(B, hw[0], hw[1], C).astype(np.float32)
           for k, hw in levels.items()}

    model = DynamicTeacher(num_classes=80, channels=C, num_heads=HEADS,
                           interact_pattern="stuGuided",
                           add_context_box=True, attn_impl="reference",
                           dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), gt, stu, (H, W))
    p = jax.tree.map(np.array, variables["params"])

    # ---- copy weights into our param tree ----------------------------
    copy_teacher_weights(p, oracle)

    tea, masks, token_valid = model.apply({"params": p}, gt, stu, (H, W))

    # ---- torch oracle on the equivalent ragged layout ----------------
    desc, valid, boxes_pad, is_ctx = encode_descriptors(
        gt, (H, W), 80, True, False)
    desc, valid = np.asarray(desc), np.asarray(valid)
    boxes_pad = np.asarray(boxes_pad)
    tok_idx = [[0, 1, cap], [0, 1, 2, cap]]  # valid rows, ctx last
    desc_tokens = np.concatenate([desc[b][tok_idx[b]] for b in range(B)])
    boxlists = np.concatenate([boxes_pad[b][tok_idx[b]] for b in range(B)])
    nr_tokens = [len(t) for t in tok_idx]
    stu_t = [torch.tensor(stu[k].transpose(0, 3, 1, 2)) for k in ("p3", "p4")]
    with torch.no_grad():
        want = oracle(torch.tensor(desc_tokens), nr_tokens, boxlists,
                      (H, W), stu_t)

    for li, k in enumerate(("p3", "p4")):
        got = np.asarray(tea[k]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want[li].numpy(), rtol=5e-3,
                                   atol=5e-4, err_msg=k)
    # validity layout sanity
    tv = np.asarray(token_valid)
    assert tv[0].tolist() == [True, True, False, False, True]
    assert tv[1].tolist() == [True, True, True, False, True]


def test_distill_loss_matches_torch_reference():
    """BaseDistillator.distill semantics (reference base_distillator.py:
    34-64): teacher always detached, student through the adapter,
    InstanceNorm2d(affine=False) per side, flattened concat, LAMBDA *
    F.mse_loss."""
    from lgd_tpu.config import get_cfg
    from lgd_tpu.models.distillator import build_model

    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "DistillatorRetinaNet"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.OUT_FEATURES = ["res3", "res4", "res5"]
    cfg.MODEL.FPN.IN_FEATURES = ["res3", "res4", "res5"]
    cfg.TPU.MAX_INSTANCES = 4
    cfg.TPU.ATTENTION_IMPL = "reference"
    cfg.freeze()
    model = build_model(cfg, dtype=jnp.float32)

    rng = np.random.RandomState(1)
    Cf = 256
    stu = {"p3": rng.randn(2, 8, 8, Cf).astype(np.float32),
           "p4": rng.randn(2, 4, 4, Cf).astype(np.float32)}
    tea = {k: rng.randn(*v.shape).astype(np.float32)
           for k, v in stu.items()}

    # init only the adapter by driving distill_loss once
    variables = model.init(jax.random.PRNGKey(0), stu, tea,
                           jnp.float32(1.0), method=model.distill_loss)
    p = jax.tree.map(np.array, variables["params"])

    # torch oracle with the same adapter weights (sequential_convs.py:11-13:
    # conv relu conv relu conv)
    convs = []
    adapter = p["adapter"]
    for name in sorted(adapter):
        t = nn.Conv2d(Cf, Cf, 3, 1, 1)
        with torch.no_grad():
            t.weight.copy_(torch.tensor(
                adapter[name]["kernel"].transpose(3, 2, 0, 1)))
            t.bias.copy_(torch.tensor(adapter[name]["bias"]))
        convs.append(t)

    def oracle(stu, tea, lam):
        s_flat, t_flat = [], []
        for k in sorted(stu):
            s = torch.tensor(stu[k].transpose(0, 3, 1, 2))
            t = torch.tensor(tea[k].transpose(0, 3, 1, 2))
            s = convs[2](TF.relu(convs[1](TF.relu(convs[0](s)))))
            s = TF.instance_norm(s)
            t = TF.instance_norm(t)
            s_flat.append(s.reshape(2, -1))
            t_flat.append(t.reshape(2, -1))
        return lam * TF.mse_loss(torch.cat(t_flat, 1), torch.cat(s_flat, 1))

    got = model.apply({"params": p}, stu, tea, jnp.float32(1.0),
                      method=model.distill_loss)
    got = float(got["loss_distill"] if isinstance(got, dict) else got)
    with torch.no_grad():
        want = float(oracle(stu, tea, cfg.MODEL.DISTILLATOR.LAMBDA))
    np.testing.assert_allclose(got, want, rtol=1e-4)
