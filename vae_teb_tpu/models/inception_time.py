"""InceptionTime classifier over VAE latents + combined VAE-classifier.

Flax re-design of /root/reference/model/inception_time.py:9-333 and the
SeqVaeTebClassifier wrapper (/root/reference/model/vae_teb_model.py:1248-1526).
Layout is (B, S, C) channels-last throughout.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BN_MOMENTUM, xavier
from .vae_teb import SeqVaeTeb

Dtype = Any

he_normal = nn.initializers.kaiming_normal


def _same_conv(features: int, kernel: int, name: str, dtype=None):
    return nn.Conv(features, (kernel,), padding="SAME", use_bias=False,
                   kernel_init=he_normal(), dtype=dtype, name=name)


class InceptionBlock(nn.Module):
    """Bottleneck + parallel convs (k=5/15/40) + max-pool branch -> concat
    4*filters -> BN/ReLU/dropout (reference FHRInception, :9-120)."""
    filters: int
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        x0 = _same_conv(self.filters, 1, "bottleneck1", dt)(x)
        x1 = _same_conv(self.filters, 5, "conv_short", dt)(x0)
        x2 = _same_conv(self.filters, 15, "conv_medium", dt)(x0)
        x3 = _same_conv(self.filters, 40, "conv_long", dt)(x0)
        pooled = nn.max_pool(x, (3,), strides=(1,), padding="SAME")
        x4 = _same_conv(self.filters, 1, "bottleneck2", dt)(pooled)
        y = jnp.concatenate([x1, x2, x3, x4], axis=-1)
        y = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM, dtype=dt)(y)
        y = nn.relu(y)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class ResidualBlock(nn.Module):
    """1x1 bottleneck + BN on the skip, add, ReLU, dropout
    (reference FHRResidual, :123-172)."""
    filters: int
    dropout: float = 0.1
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x_skip, y, train: bool = True):
        res = _same_conv(4 * self.filters, 1, "bottleneck", self.dtype)(x_skip)
        res = nn.BatchNorm(use_running_average=not train,
                           momentum=BN_MOMENTUM, dtype=self.dtype)(res)
        y = nn.relu(y + res)
        return nn.Dropout(self.dropout, deterministic=not train)(y)


class InceptionTimeClassifier(nn.Module):
    """Input projection -> depth inception blocks (residual every 3rd) ->
    optional 4-head self-attention -> GAP -> 3-layer MLP head
    (reference FHRInceptionTimeClassifier, :185-333)."""
    input_size: int = 32
    num_classes: int = 2
    filters: int = 32
    depth: int = 6
    dropout: float = 0.2
    use_attention: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.LayerNorm(dtype=self.dtype)(x)
        x = nn.Dense(self.input_size, kernel_init=xavier(),
                     dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout * 0.5, deterministic=not train)(x)

        residual_input = x
        y = x
        res_idx = 0
        for d in range(self.depth):
            y = InceptionBlock(self.filters, self.dropout, dtype=self.dtype,
                               name=f"inception_{d}")(y if d else x, train)
            if d % 3 == 2:
                y = ResidualBlock(self.filters, self.dropout,
                                  dtype=self.dtype,
                                  name=f"residual_{res_idx}")(
                                      residual_input, y, train)
                residual_input = y
                res_idx += 1

        if self.use_attention:
            attn = nn.SelfAttention(num_heads=4,
                                    dropout_rate=self.dropout,
                                    deterministic=not train,
                                    dtype=self.dtype,
                                    name="attention")(y)
            y = nn.LayerNorm(dtype=self.dtype, name="attention_norm")(y + attn)

        y = y.mean(axis=1)  # global average pool over sequence
        for width in (2 * self.filters, self.filters):
            y = nn.Dense(width, kernel_init=xavier(), dtype=self.dtype)(y)
            y = nn.LayerNorm(dtype=self.dtype)(y)
            y = nn.gelu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return nn.Dense(self.num_classes, kernel_init=xavier(),
                        dtype=self.dtype)(y)


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()


class SeqVaeTebClassifier(nn.Module):
    """VAE latent extraction + InceptionTime head. freeze_vae stops
    gradients into the VAE (the functional analogue of the reference's
    requires_grad_(False), :1349-1353); loading pretrained VAE params is a
    checkpoint-surgery concern handled in train/checkpoint.py."""
    num_classes: int = 2
    classifier_filters: int = 32
    classifier_depth: int = 6
    classifier_dropout: float = 0.2
    use_attention: bool = True
    freeze_vae: bool = True
    latent_dim_z: int = 32
    dtype: Optional[Dtype] = None

    def setup(self):
        self.vae_model = SeqVaeTeb(latent_dim_z=self.latent_dim_z,
                                   dtype=self.dtype)
        self.classifier = InceptionTimeClassifier(
            input_size=self.latent_dim_z, num_classes=self.num_classes,
            filters=self.classifier_filters, depth=self.classifier_depth,
            dropout=self.classifier_dropout,
            use_attention=self.use_attention, dtype=self.dtype)

    def __call__(self, y_st, y_ph, x_ph, train: bool = True,
                 deterministic_latent: bool = False) -> Dict:
        vae_train = train and not self.freeze_vae
        outputs = self.vae_model(y_st, y_ph, x_ph, train=vae_train,
                                 deterministic=deterministic_latent)
        z = outputs["z"]
        if self.freeze_vae:
            z = jax.lax.stop_gradient(z)
        logits = self.classifier(z, train)
        return {"logits": logits,
                "probabilities": jax.nn.softmax(logits, axis=-1),
                "predictions": jnp.argmax(logits, axis=-1),
                "latent_z": z,
                "vae_outputs": outputs}

    @staticmethod
    def compute_loss(outputs: Dict, labels, y_st=None, y_ph=None, y_raw=None,
                     compute_vae_loss: bool = False,
                     vae_loss_weight: float = 0.1) -> Dict:
        cls_loss = cross_entropy_loss(outputs["logits"], labels)
        vae_total = jnp.float32(0.0)
        if compute_vae_loss and y_raw is not None:
            vae_losses = SeqVaeTeb.compute_loss(outputs["vae_outputs"],
                                                y_st, y_ph, y_raw, beta=1.0)
            vae_total = vae_losses["total_loss"]
        return {"classification_loss": cls_loss,
                "vae_loss": vae_total,
                "total_loss": cls_loss + vae_loss_weight * vae_total}
