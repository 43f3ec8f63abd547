"""ResNet-18 image encoder for the RGBDM state variant.

TPU counterpart of the reference's torchvision-based `ResNetFeature`
(reference: core/networks.py:106-147): 5-channel 112x112 RGBDM input,
512-d output, with the same per-channel normalization constants. No
pretrained weights are auto-downloaded (zero-egress); `load_torch_state`
/ `load_pretrained_encoders` ingest a torchvision resnet18 state dict
provided on disk (`AgentConfig.pretrained_resnet`), zero-extending the
first conv to the 5-channel input exactly like the reference
(reference: core/networks.py:38-58).
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

# RGB stats + identity for depth/mask (reference: core/networks.py:129-132).
_MEAN = jnp.array([0.485, 0.456, 0.406, 0.0, 0.0])
_STD = jnp.array([0.229, 0.224, 0.225, 1.0, 1.0])


def _torch_block_entries(stage_sizes):
    """(flax BasicBlock name, torch 'layerL.B' prefix, has_downsample)."""
    entries = []
    idx = 0
    for stage, blocks in enumerate(stage_sizes):
        for b in range(blocks):
            entries.append((
                f"BasicBlock_{idx}",
                f"layer{stage + 1}.{b}",
                b == 0 and stage > 0,  # stride-2/width-change blocks
            ))
            idx += 1
    return entries


def _conv(w):
    """torch (O, I, kh, kw) -> flax kernel (kh, kw, I, O)."""
    import numpy as np

    return jnp.asarray(np.transpose(np.asarray(w), (2, 3, 1, 0)), jnp.float32)


def load_torch_state(variables, state_dict, stage_sizes=(2, 2, 2, 2)):
    """Map a torchvision resnet18 state dict onto ONE ResNet18Feature.

    `variables` is {"params": ..., "batch_stats": ...} for a single
    ResNet18Feature; returns the same structure (plain dicts) with every
    conv/BN leaf replaced by the torch weights. Like the reference
    (reference: core/networks.py:38-58 _resnet), the first conv is
    zero-extended from the pretrained 3 input channels to this model's
    input_channels, and the torchvision `fc` head is ignored (this trunk
    ends at global average pooling). Values may be torch CPU tensors or
    numpy arrays.
    """
    import numpy as np

    from flax.core import unfreeze

    params = unfreeze(variables["params"])
    stats = unfreeze(variables["batch_stats"])

    def put_bn(flax_name, torch_prefix):
        params[flax_name]["scale"] = jnp.asarray(
            np.asarray(state_dict[torch_prefix + ".weight"]), jnp.float32)
        params[flax_name]["bias"] = jnp.asarray(
            np.asarray(state_dict[torch_prefix + ".bias"]), jnp.float32)
        stats[flax_name]["mean"] = jnp.asarray(
            np.asarray(state_dict[torch_prefix + ".running_mean"]), jnp.float32)
        stats[flax_name]["var"] = jnp.asarray(
            np.asarray(state_dict[torch_prefix + ".running_var"]), jnp.float32)

    # stem: conv1 zero-extended 3 -> input_channels along flax axis 2
    w1 = _conv(state_dict["conv1.weight"])
    k1 = params["Conv_0"]["kernel"]
    if k1.shape[2] > w1.shape[2]:
        w1 = jnp.concatenate(
            [w1, jnp.zeros(w1.shape[:2] + (k1.shape[2] - w1.shape[2], w1.shape[3]),
                           jnp.float32)], axis=2)
    params["Conv_0"]["kernel"] = w1
    put_bn("BatchNorm_0", "bn1")

    for flax_block, torch_block, has_ds in _torch_block_entries(stage_sizes):
        blk = params[flax_block]
        bst = stats[flax_block]
        blk["Conv_0"]["kernel"] = _conv(state_dict[torch_block + ".conv1.weight"])
        blk["Conv_1"]["kernel"] = _conv(state_dict[torch_block + ".conv2.weight"])
        for i in (0, 1):
            bn = f"BatchNorm_{i}"
            tp = f"{torch_block}.bn{i + 1}"
            blk[bn]["scale"] = jnp.asarray(
                np.asarray(state_dict[tp + ".weight"]), jnp.float32)
            blk[bn]["bias"] = jnp.asarray(
                np.asarray(state_dict[tp + ".bias"]), jnp.float32)
            bst[bn]["mean"] = jnp.asarray(
                np.asarray(state_dict[tp + ".running_mean"]), jnp.float32)
            bst[bn]["var"] = jnp.asarray(
                np.asarray(state_dict[tp + ".running_var"]), jnp.float32)
        if has_ds:
            blk["Conv_2"]["kernel"] = _conv(
                state_dict[torch_block + ".downsample.0.weight"])
            tp = torch_block + ".downsample.1"
            blk["BatchNorm_2"]["scale"] = jnp.asarray(
                np.asarray(state_dict[tp + ".weight"]), jnp.float32)
            blk["BatchNorm_2"]["bias"] = jnp.asarray(
                np.asarray(state_dict[tp + ".bias"]), jnp.float32)
            bst["BatchNorm_2"]["mean"] = jnp.asarray(
                np.asarray(state_dict[tp + ".running_mean"]), jnp.float32)
            bst["BatchNorm_2"]["var"] = jnp.asarray(
                np.asarray(state_dict[tp + ".running_var"]), jnp.float32)

    return {"params": params, "batch_stats": stats}


def export_torch_state(variables, stage_sizes=(2, 2, 2, 2)):
    """Inverse of `load_torch_state`: ONE ResNet18Feature's variables ->
    a torchvision-layout state dict of numpy arrays (conv kernels back
    in torch (O, I, kh, kw) order, BN under weight/bias/running_*).

    Lets a sim-trained encoder round-trip through the same ingestion
    path as torchvision weights (`AgentConfig.pretrained_resnet` +
    np.savez) -- the zero-egress substitute for ImageNet pretraining
    and a deployment interchange format (the reference's torch
    checkpoints are its interchange, core/utils.py:319-334). conv1 is
    exported at this model's full input-channel width; load_torch_state
    only zero-extends when the on-disk conv is narrower.
    """
    import numpy as np

    params = variables["params"]
    stats = variables["batch_stats"]
    sd = {}

    def conv_back(k):
        return np.transpose(np.asarray(k), (3, 2, 0, 1))

    def put_bn(flax_scope, torch_prefix, p, s):
        sd[torch_prefix + ".weight"] = np.asarray(p[flax_scope]["scale"])
        sd[torch_prefix + ".bias"] = np.asarray(p[flax_scope]["bias"])
        sd[torch_prefix + ".running_mean"] = np.asarray(s[flax_scope]["mean"])
        sd[torch_prefix + ".running_var"] = np.asarray(s[flax_scope]["var"])

    sd["conv1.weight"] = conv_back(params["Conv_0"]["kernel"])
    put_bn("BatchNorm_0", "bn1", params, stats)
    for flax_block, torch_block, has_ds in _torch_block_entries(stage_sizes):
        blk, bst = params[flax_block], stats[flax_block]
        sd[torch_block + ".conv1.weight"] = conv_back(blk["Conv_0"]["kernel"])
        sd[torch_block + ".conv2.weight"] = conv_back(blk["Conv_1"]["kernel"])
        for i in (0, 1):
            put_bn(f"BatchNorm_{i}", f"{torch_block}.bn{i + 1}", blk, bst)
        if has_ds:
            sd[torch_block + ".downsample.0.weight"] = conv_back(
                blk["Conv_2"]["kernel"])
            put_bn("BatchNorm_2", torch_block + ".downsample.1", blk, bst)
    return sd


def load_pretrained_encoders(feat_params, feat_stats, state_dict):
    """Load a torchvision resnet18 state dict into BOTH ImageFeature
    encoders (the reference pretrains policy and value encoders alike,
    reference: core/networks.py:118,126). Returns (params, stats) as
    plain dict trees with the same top-level layout."""
    from flax.core import unfreeze

    params = unfreeze(feat_params)
    stats = unfreeze(feat_stats)
    for enc in ("encoder", "value_encoder"):
        loaded = load_torch_state(
            {"params": params[enc], "batch_stats": stats[enc]}, state_dict
        )
        params[enc] = loaded["params"]
        stats[enc] = loaded["batch_stats"]
    return params, stats


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        residual = x
        y = nn.Conv(self.channels, (3, 3), (self.stride, self.stride), padding=1,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9)(y)
        if residual.shape[-1] != self.channels or self.stride != 1:
            residual = nn.Conv(self.channels, (1, 1), (self.stride, self.stride),
                               use_bias=False)(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9)(residual)
        return nn.relu(y + residual)


class ImageFeature(nn.Module):
    """Policy + value ResNet-18 encoders over RGBDM images.

    Drop-in replacement for PointNetFeature with the same call contract
    (reference: core/networks.py:106-147 ResNetFeature): separate
    `encoder` / `value_encoder` submodules (the names the optimizer
    subtrees key on). The reference feeds the action to the QNetwork
    head instead of the extractor (sa_channel_concat=False in image
    mode); here the action is appended to the value feature, which is
    the same computation once the Q head concatenates.
    """

    def setup(self):
        self.encoder = ResNet18Feature(name="encoder")
        self.value_encoder = ResNet18Feature(name="value_encoder")

    def __call__(self, image, action=None, value: bool = False,
                 train: bool = True):
        """image (B, 5, H, W) channels-first RGBDM."""
        if value:
            z = self.value_encoder(image, train)
            if action is not None:
                z = jnp.concatenate([z, action], axis=-1)
            return z
        return self.encoder(image, train)


class ResNet18Feature(nn.Module):
    """(B, C, H, W) channels-first RGBDM -> (B, 512)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    input_channels: int = 5

    @nn.compact
    def __call__(self, img, train: bool = True):
        c = img.shape[1]
        x = (img - _MEAN[:c, None, None]) / _STD[:c, None, None]
        x = jnp.transpose(x, (0, 2, 3, 1))  # NHWC for TPU convs
        x = nn.Conv(64, (7, 7), (2, 2), padding=3, use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), (2, 2), padding=((1, 1), (1, 1)))
        for i, (blocks, ch) in enumerate(zip(self.stage_sizes, (64, 128, 256, 512))):
            for b in range(blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                x = BasicBlock(ch, stride)(x, train)
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        return x
