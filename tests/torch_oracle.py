"""Minimal torch oracle models reproducing the reference's numerics for parity
tests (reference semantics per SURVEY.md sections 2-3). These are test-only —
the framework itself has no torch dependency on the compute path."""
from __future__ import annotations

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class TorchResBlock(nn.Module):
    """Pre-LN residual attention block with QuickGELU MLP (CLIP ViT block)."""

    def __init__(self, d: int, heads: int):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, heads)
        self.ln_1 = nn.LayerNorm(d)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, d * 4))
        self.mlp.add_module("c_proj", nn.Linear(d * 4, d))

    def forward(self, x, attn_mask=None):  # x: [s, b, d]
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        y = self.ln_2(x)
        h = self.mlp.c_fc(y)
        y = self.mlp.c_proj(h * torch.sigmoid(1.702 * h))
        return x + y


class TorchCLIPViT(nn.Module):
    def __init__(self, width=64, layers=2, heads=4, patch=16, out_dim=32,
                 resolution=224):
        super().__init__()
        self.patch = patch
        self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        grid = resolution // patch
        self.positional_embedding = nn.Parameter(
            scale * torch.randn(grid * grid + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.resblocks = nn.ModuleList(
            [TorchResBlock(width, heads) for _ in range(layers)])
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, out_dim))

    @staticmethod
    def interp_pos(pe: torch.Tensor, size):
        cls_pe, patch_pe = pe[:1], pe[1:]
        hw, d = patch_pe.shape
        g = int(math.sqrt(hw))
        h, w = size[0] + 0.1, size[1] + 0.1
        out = F.interpolate(
            patch_pe.view(1, g, g, d).permute(0, 3, 1, 2),
            scale_factor=(h / g, w / g), mode="bicubic",
        )
        out = out.permute(0, 2, 3, 1).view(-1, d)
        return torch.cat([cls_pe, out], dim=0)

    def forward(self, x):  # [b, 3, H, W]
        x = self.conv1(x)
        b, c, h, w = x.shape
        tokens = x.flatten(2).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(b, 1, c)
        tokens = torch.cat([cls, tokens], dim=1)
        tokens = tokens + self.interp_pos(self.positional_embedding, (h, w))[None]
        tokens = self.ln_pre(tokens)
        tokens = tokens.permute(1, 0, 2)
        for blk in self.resblocks:
            tokens = blk(tokens)
        tokens = tokens.permute(1, 0, 2)
        return self.ln_post(tokens[:, 1:]), h, w


class TorchDecoderLayer(nn.Module):
    """DETR post-norm decoder layer."""

    def __init__(self, d, heads, ff=2048):
        super().__init__()
        self.self_attn = nn.MultiheadAttention(d, heads)
        self.multihead_attn = nn.MultiheadAttention(d, heads)
        self.linear1 = nn.Linear(d, ff)
        self.linear2 = nn.Linear(ff, d)
        self.norm1 = nn.LayerNorm(d)
        self.norm2 = nn.LayerNorm(d)
        self.norm3 = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos):  # all [s, b, d]
        q = k = tgt + query_pos
        tgt = self.norm1(tgt + self.self_attn(q, k, tgt, need_weights=False)[0])
        tgt = self.norm2(tgt + self.multihead_attn(
            tgt + query_pos, memory + pos, memory, need_weights=False)[0])
        tgt = self.norm3(tgt + self.linear2(F.relu(self.linear1(tgt))))
        return tgt


class TorchQueryDecoder(nn.Module):
    def __init__(self, d, heads, num_layers, ff=2048):
        super().__init__()
        self.layers = nn.ModuleList(
            [TorchDecoderLayer(d, heads, ff) for _ in range(num_layers)])
        self.norm = nn.LayerNorm(d)

    def forward(self, tgt, memory, pos, query_pos):
        outs = []
        x = tgt
        for layer in self.layers:
            x = layer(x, memory, pos, query_pos)
            outs.append(self.norm(x))
        return torch.stack(outs)  # [L, s, b, d]


class TorchBottleneck(nn.Module):
    """CLIP anti-aliased bottleneck (reference clip_arch.py:12-57 semantics)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.avgpool = nn.AvgPool2d(stride) if stride > 1 else nn.Identity()
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = None
        if stride > 1 or inplanes != planes * 4:
            self.downsample = nn.Sequential()
            self.downsample.add_module("pool", nn.AvgPool2d(stride) if stride > 1 else nn.Identity())
            self.downsample.add_module("conv", nn.Conv2d(inplanes, planes * 4, 1, bias=False))
            self.downsample.add_module("bn", nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.avgpool(out)
        out = self.bn3(self.conv3(out))
        identity = x if self.downsample is None else self.downsample(x)
        return F.relu(out + identity)


class TorchAttentionPool2d(nn.Module):
    """QKV attention pool returning all tokens, with the interpolated
    positional embedding (reference clip_arch.py:60-126)."""

    def __init__(self, spacial_dim, embed_dim, num_heads, output_dim):
        super().__init__()
        self.positional_embedding = nn.Parameter(
            torch.randn(spacial_dim ** 2 + 1, embed_dim) / embed_dim ** 0.5)
        self.q_proj = nn.Linear(embed_dim, embed_dim)
        self.k_proj = nn.Linear(embed_dim, embed_dim)
        self.v_proj = nn.Linear(embed_dim, embed_dim)
        self.c_proj = nn.Linear(embed_dim, output_dim)
        self.num_heads = num_heads

    def forward(self, x):  # [b, c, h, w] -> [(1+hw), b, out]
        h_feat, w_feat = x.shape[-2:]
        x = x.flatten(start_dim=2).permute(2, 0, 1)
        x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
        pe = TorchCLIPViT.interp_pos(
            self.positional_embedding, (h_feat, w_feat))
        x = x + pe[:, None, :]
        out, _ = F.multi_head_attention_forward(
            query=x, key=x, value=x,
            embed_dim_to_check=x.shape[-1], num_heads=self.num_heads,
            q_proj_weight=self.q_proj.weight, k_proj_weight=self.k_proj.weight,
            v_proj_weight=self.v_proj.weight, in_proj_weight=None,
            in_proj_bias=torch.cat(
                [self.q_proj.bias, self.k_proj.bias, self.v_proj.bias]),
            bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0,
            out_proj_weight=self.c_proj.weight,
            out_proj_bias=self.c_proj.bias,
            use_separate_proj_weight=True, training=False, need_weights=False)
        return out


class TorchModifiedResNet(nn.Module):
    """CLIP ModifiedResNet dense path (reference clip_arch.py:156-264)."""

    def __init__(self, layers=(1, 1, 1, 1), width=8, output_dim=32,
                 heads=4, input_resolution=64):
        super().__init__()
        self.conv1 = nn.Conv2d(3, width // 2, 3, stride=2, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(width // 2)
        self.conv2 = nn.Conv2d(width // 2, width // 2, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width // 2)
        self.conv3 = nn.Conv2d(width // 2, width, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(width)
        self.avgpool = nn.AvgPool2d(2)
        self._inplanes = width

        def make_layer(planes, blocks, stride=1):
            mods = [TorchBottleneck(self._inplanes, planes, stride)]
            self._inplanes = planes * 4
            for _ in range(1, blocks):
                mods.append(TorchBottleneck(self._inplanes, planes))
            return nn.Sequential(*mods)

        self.layer1 = make_layer(width, layers[0])
        self.layer2 = make_layer(width * 2, layers[1], stride=2)
        self.layer3 = make_layer(width * 4, layers[2], stride=2)
        self.layer4 = make_layer(width * 8, layers[3], stride=2)
        self.attnpool = TorchAttentionPool2d(
            input_resolution // 32, width * 32, heads, output_dim)

    def features(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = F.relu(self.bn2(self.conv2(x)))
        x = F.relu(self.bn3(self.conv3(x)))
        x = self.avgpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
        return x

    def forward(self, x):  # dense tokens like reference forward :254-255
        x = self.features(x)
        h, w = x.shape[-2:]
        return x.flatten(start_dim=-2).permute(0, 2, 1), h, w

    def state_dict_clip_layout(self):
        """Rename test-layout keys to the official CLIP checkpoint layout
        ('visual.' prefix, downsample Sequential indices '0'/'1')."""
        out = {}
        for k, v in self.state_dict().items():
            k = k.replace("downsample.conv", "downsample.0")
            k = k.replace("downsample.bn", "downsample.1")
            if "downsample.pool" in k or "num_batches_tracked" in k:
                continue
            out["visual." + k] = v
        return out


class TorchDeiTBlock(nn.Module):
    """timm/DINO pre-norm ViT block: fused qkv attention + GELU MLP
    (reference networks/selfmask/vision_transformer.py:97-180 semantics)."""

    def __init__(self, dim, heads, mlp_ratio=4):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, dim * 3)
        self.attn.proj = nn.Linear(dim, dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, dim * mlp_ratio)
        self.mlp.fc2 = nn.Linear(dim * mlp_ratio, dim)
        self.heads = heads

    def forward(self, x):  # [b, n, d]
        b, n, d = x.shape
        h = self.heads
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, n, 3, h, d // h)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        w = (q @ k.transpose(-2, -1)) * (d // h) ** -0.5
        w = w.softmax(dim=-1)
        y = (w @ v).transpose(1, 2).reshape(b, n, d)
        x = x + self.attn.proj(y)
        y = self.norm2(x)
        return x + self.mlp.fc2(F.gelu(self.mlp.fc1(y)))


class TorchSelfMask(nn.Module):
    """Reference SelfMask semantics on a small config: DeiT encoder (last
    layer, post-norm, CLS dropped), DETR decoder with NO memory pos-emb,
    mask = sigmoid(queries . x2-upsampled tokens), objectness = 3-layer MLP
    (reference networks/selfmask/selfmask.py:137-245, state-dict layout of
    selfmask_nq20.pt)."""

    def __init__(self, dim=32, heads=2, depth=2, patch=8, grid=4,
                 n_queries=5, dec_layers=2):
        super().__init__()
        self.patch = patch
        self.encoder = nn.Module()
        self.encoder.patch_embed = nn.Module()
        self.encoder.patch_embed.proj = nn.Conv2d(3, dim, patch, patch)
        self.encoder.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.encoder.pos_embed = nn.Parameter(
            0.02 * torch.randn(1, grid * grid + 1, dim))
        self.encoder.blocks = nn.ModuleList(
            [TorchDeiTBlock(dim, heads) for _ in range(depth)])
        self.encoder.norm = nn.LayerNorm(dim)
        self.decoder = TorchQueryDecoder(dim, heads, dec_layers, ff=dim * 4)
        self.query_embed = nn.Parameter(torch.randn(n_queries, dim))
        self.ffn = nn.Module()
        self.ffn.layers = nn.ModuleList(
            [nn.Linear(dim, dim), nn.Linear(dim, dim), nn.Linear(dim, 1)])

    def forward(self, x):  # [b, 3, H, W], H/W patch multiples
        b = x.shape[0]
        t = self.encoder.patch_embed.proj(x)
        _, d, h, w = t.shape
        tokens = t.flatten(2).permute(0, 2, 1)
        cls = self.encoder.cls_token.expand(b, 1, d)
        tokens = torch.cat([cls, tokens], dim=1)
        # SelfMask reference variant (vision_transformer.py:377-401):
        # identity at the native grid; exact-size bicubic otherwise (no
        # +0.1 fudge — that is the CLIP tower's interpolation)
        pe0 = self.encoder.pos_embed[0]
        g = int((pe0.shape[0] - 1) ** 0.5)
        if (h, w) == (g, g):
            pe = pe0
        else:
            cls_pe, patch_pe = pe0[:1], pe0[1:]
            grid = patch_pe.reshape(g, g, -1).permute(2, 0, 1)[None]
            grid = torch.nn.functional.interpolate(
                grid, size=(h, w), mode="bicubic", align_corners=False)
            patch_pe = grid[0].permute(1, 2, 0).reshape(h * w, -1)
            pe = torch.cat([cls_pe, patch_pe], dim=0)
        tokens = tokens + pe[None]
        for blk in self.encoder.blocks:
            tokens = blk(tokens)
        tokens = self.encoder.norm(tokens)
        patch_tokens = tokens[:, 1:, :]  # [b, hw, d]

        def t_(z):
            return z.permute(1, 0, 2)

        qp = self.query_embed[:, None, :].expand(-1, b, -1).permute(1, 0, 2)
        queries = self.decoder(
            t_(torch.zeros_like(qp)), t_(patch_tokens),
            torch.zeros(patch_tokens.shape[1], b, d), t_(qp))[-1]
        queries = queries.permute(1, 0, 2)  # [b, Q, d]

        grid = patch_tokens.permute(0, 2, 1).reshape(b, d, h, w)
        grid = F.interpolate(grid, scale_factor=2, mode="bilinear")
        mask_pred = torch.sigmoid(
            torch.einsum("bqn,bnhw->bqhw", queries, grid))
        obj = queries
        for i, lin in enumerate(self.ffn.layers):
            obj = lin(obj)
            if i < 2:
                obj = F.relu(obj)
        return mask_pred, obj[..., 0]

def torch_sine_pos_embed(h, w, npf, temperature=10000.0):
    """Reference PositionEmbeddingSine with normalize=True, no mask."""
    ones = torch.ones(1, h, w)
    y = ones.cumsum(1); x = ones.cumsum(2)
    eps, scale = 1e-6, 2 * math.pi
    y = y / (y[:, -1:, :] + eps) * scale
    x = x / (x[:, :, -1:] + eps) * scale
    dim_t = torch.arange(npf, dtype=torch.float32)
    dim_t = temperature ** (2 * (dim_t // 2) / npf)
    px, py = x[..., None] / dim_t, y[..., None] / dim_t
    px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
    py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
    return torch.cat((py, px), dim=3).permute(0, 3, 1, 2)  # [1, 2npf, h, w]
