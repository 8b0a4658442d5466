"""Golden parity test: our padded/batched LabelEncoder must reproduce the
reference's ragged computation (label_encoder.py:119-276 +
spatial_transformer.py:9-47) bit-for-bit (up to float tolerance).

The reference architecture is re-stated here in torch (per-token Conv1d(k=1)
stacks + affine-free LayerNorms + per-image hierarchical max-pool); weights
are copied into our Flax params and outputs compared for a ragged 2-image
minibatch against the padded batched forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as TF

from lgd_tpu.models.lgd.label_encoder import LabelEncoder, encode_descriptors
from lgd_tpu.structures import BatchedInstances

K = 84  # 4 + 80 one-hot


class TorchSTN(nn.Module):
    """reference spatial_transformer.py:9-47 (identity shortcut removed)."""

    def __init__(self, k):
        super().__init__()
        self.k = k
        self.conv1 = nn.Conv1d(k, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.fc1 = nn.Linear(1024, 512)
        self.fc2 = nn.Linear(512, 256)
        self.fc3 = nn.Linear(256, k * k)
        self.bn1 = nn.LayerNorm([64, 1], elementwise_affine=False)
        self.bn2 = nn.LayerNorm([128, 1], elementwise_affine=False)
        self.bn3 = nn.LayerNorm([1024, 1], elementwise_affine=False)
        self.bn4 = nn.LayerNorm([512], elementwise_affine=False)
        self.bn5 = nn.LayerNorm([256], elementwise_affine=False)

    def forward(self, x):  # (T, k, 1)
        x = TF.relu(self.bn1(self.conv1(x)))
        x = TF.relu(self.bn2(self.conv2(x)))
        x = TF.relu(self.bn3(self.conv3(x)))
        x = torch.max(x, 2, keepdim=True)[0].view(-1, 1024)
        x = TF.relu(self.bn4(self.fc1(x)))
        x = TF.relu(self.bn5(self.fc2(x)))
        return self.fc3(x).view(-1, self.k, self.k)


class TorchLabelEncoder(nn.Module):
    """reference label_encoder.py:119-276, R=1, one_hot."""

    def __init__(self, k=K):
        super().__init__()
        self.inp = k
        self.stn_desc = TorchSTN(k)
        self.stn_feat = TorchSTN(64)
        self.conv1 = nn.Conv1d(k, 64, 1)
        self.conv2 = nn.Conv1d(64, 128, 1)
        self.conv3 = nn.Conv1d(128, 1024, 1)
        self.conv4 = nn.Conv1d(1088, 256, 1)
        self.bn1 = nn.LayerNorm([64, 1], elementwise_affine=False)
        self.bn2 = nn.LayerNorm([128, 1], elementwise_affine=False)
        self.bn3 = nn.LayerNorm([1024, 1], elementwise_affine=False)
        self.bn4 = nn.LayerNorm([256, 1], elementwise_affine=False)

    def forward(self, x, nr_gt_per_img):  # x: (T, k, 1)
        t_desc = self.stn_desc(x)
        x = torch.bmm(x.permute(0, 2, 1), t_desc).permute(0, 2, 1)
        x = TF.relu(self.bn1(self.conv1(x)))
        t_feat = self.stn_feat(x)
        x_feat = torch.bmm(x.permute(0, 2, 1), t_feat).permute(0, 2, 1)
        x = TF.relu(self.bn2(self.conv2(x_feat)))
        x = TF.relu(self.bn3(self.conv3(x)))
        # hierarchical pooling (R=1)
        parts = torch.split(x, nr_gt_per_img, dim=0)
        x_g = torch.stack([p.max(dim=0)[0] for p in parts], 0)  # (B, 1024, 1)
        x_g_remap = torch.cat(
            [g.unsqueeze(0).repeat(n, 1, 1)
             for g, n in zip(x_g, nr_gt_per_img)], 0)
        x_cat = torch.cat([x_feat, x_g_remap], dim=1)
        x = TF.relu(self.bn4(self.conv4(x_cat)))
        return x.squeeze(-1)  # (T, 256)


def _copy_token_mlp(params, torch_mod):
    """our TokenMLP 'linear' <- torch Conv1d(k=1) or Linear."""
    w = torch_mod.weight.detach().numpy()
    if w.ndim == 3:  # conv1d (out, in, 1)
        w = w[..., 0]
    params["linear"]["kernel"] = jnp.asarray(w.T)
    params["linear"]["bias"] = jnp.asarray(torch_mod.bias.detach().numpy())


def _copy_stn(params, tstn):
    _copy_token_mlp(params["conv1"], tstn.conv1)
    _copy_token_mlp(params["conv2"], tstn.conv2)
    _copy_token_mlp(params["conv3"], tstn.conv3)
    _copy_token_mlp(params["fc1"], tstn.fc1)
    _copy_token_mlp(params["fc2"], tstn.fc2)
    params["fc3"]["kernel"] = jnp.asarray(tstn.fc3.weight.detach().numpy().T)
    params["fc3"]["bias"] = jnp.asarray(tstn.fc3.bias.detach().numpy())


def test_label_encoder_matches_torch_reference():
    torch.manual_seed(0)
    tenc = TorchLabelEncoder().eval()

    # ragged annotations for 2 images on a 100x80 padded canvas
    H, W = 80, 100
    boxes1 = np.array([[10, 10, 50, 40], [30, 20, 90, 70]], np.float32)
    cls1 = np.array([3, 77])
    boxes2 = np.array([[5, 5, 60, 60], [20, 30, 80, 75], [0, 0, 99, 79]],
                      np.float32)
    cls2 = np.array([0, 15, 42])

    # --- reference descriptor construction (box_descriptor_encode semantics)
    def ref_desc(boxes, cls):
        b = boxes.copy()
        b[:, [0, 2]] = b[:, [0, 2]].clip(0, W - 1) / W
        b[:, [1, 3]] = b[:, [1, 3]].clip(0, H - 1) / H
        onehot = np.zeros((len(cls), 80), np.float32)
        onehot[np.arange(len(cls)), cls] = 1
        d = np.concatenate([b, onehot], 1)
        return d * 2 - 1

    d1, d2 = ref_desc(boxes1, cls1), ref_desc(boxes2, cls2)
    x = torch.tensor(np.concatenate([d1, d2])).unsqueeze(-1)  # (T, k, 1)
    with torch.no_grad():
        ref_out = tenc(x, [2, 3]).numpy()  # (5, 256)

    # --- ours: padded batch
    gt = BatchedInstances.from_lists([boxes1, boxes2], [cls1, cls2],
                                     capacity=4)
    desc, valid, _, _ = encode_descriptors(gt, (H, W), 80,
                                           add_context_box=False)
    # descriptor parity first
    np.testing.assert_allclose(np.asarray(desc[0, :2]), d1, atol=1e-6)
    np.testing.assert_allclose(np.asarray(desc[1, :3]), d2, atol=1e-6)

    enc = LabelEncoder(num_classes=80, add_context_box=False,
                       dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), desc, valid)
    p = jax.tree.map(lambda x: np.array(x), variables["params"])
    # copy torch weights in
    _copy_stn(p["stn_desc"], tenc.stn_desc)
    _copy_stn(p["stn_feat"], tenc.stn_feat)
    _copy_token_mlp(p["conv1"], tenc.conv1)
    _copy_token_mlp(p["conv2"], tenc.conv2)
    _copy_token_mlp(p["conv3"], tenc.conv3)
    _copy_token_mlp(p["conv4"], tenc.conv4)

    out = enc.apply({"params": p}, desc, valid)  # (2, 4, 256)
    got = np.concatenate([np.asarray(out[0, :2]), np.asarray(out[1, :3])])
    np.testing.assert_allclose(got, ref_out, rtol=5e-4, atol=5e-5)
    # padded slots are zeroed
    assert float(jnp.abs(out[0, 2:]).max()) == 0.0
