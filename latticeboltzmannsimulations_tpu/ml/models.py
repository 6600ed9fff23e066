"""Flax encoder-decoder CNN family — capability parity with the reference's
ten Keras surrogates (``CNN_One`` ... ``CNN_Ten``, SURVEY.md §2.6).

One configurable module, ``CavityCNN``, plus ten presets reproducing each
variant's architectural capabilities:

* strided conv encoder -> transposed-conv decoder (all variants)
* twin decoder branches a/b concatenated before the head
  (reference: ``CNNOne_192/CNN_One.py:79-97``)
* input skip-concat before the 1x1 head (all variants)
* auxiliary lid-BC velocity planes joined at input and/or head
  (CNN_Eight/Nine: ``CNNEight_384/CNN_Eight.py:23-25,128-129``)
* multi-scale "inception" front end with parallel 2/4/8/12 kernels
  (CNN_Nine: ``CNNNine_384/CNN_Nine.py:111-117``)
* LeakyReLU activations + Adam (CNN_Ten: ``CNNTen_384/CNN_Ten.py:116-165``)

Layout is NHWC (TPU-native) instead of the reference's channels_first; each
model predicts ONE velocity component (the reference's ``xy`` switch —
train two parameter sets, one per component).  Convolutions are bf16-friendly
(params f32, compute dtype configurable) and sized to land on the MXU.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CNNPreset:
    name: str
    resolution: int                       # native training grid
    encoder: Tuple[Tuple[int, int, int], ...]   # (features, kernel, stride)
    decoder: Tuple[Tuple[int, int, int], ...]   # (features, kernel, stride)
    twin_decoders: bool = True
    multiscale_front: Optional[Tuple[int, ...]] = None
    aux_bc_at_input: bool = False
    aux_bc_at_head: bool = False
    activation: str = "relu"              # 'relu' | 'leaky_relu'
    optimizer: str = "rmsprop"            # 'rmsprop' | 'adam'
    # input scaling mode (the M4-M6 deltas): 'max' = divide by per-array max
    # (CNN_One..Three), 'minmax' = MinMaxScaler to scale_range (CNN_Four+)
    scaling: str = "max"
    scale_range: Tuple[float, float] = (0.2, 0.7)
    epochs: int = 500
    batch_size: int = 5


# Encoder/decoder shapes follow each reference variant's stride pyramid; the
# capability (depth, downsampling factors, twin decoders, heads) is what is
# preserved — exact channel counts match where the survey records them.
PRESETS = {
    "cnn_one": CNNPreset(
        name="cnn_one", resolution=192,
        encoder=((128, 12, 12), (256, 4, 4), (512, 4, 1)),
        decoder=((256, 4, 1), (128, 4, 4), (64, 12, 12)),
        epochs=500, batch_size=5,
    ),
    "cnn_two": CNNPreset(
        name="cnn_two", resolution=192,
        encoder=((64, 4, 4), (128, 4, 4), (256, 4, 3), (512, 4, 1)),
        decoder=((256, 4, 1), (128, 4, 3), (64, 4, 4), (32, 4, 4)),
        epochs=500, batch_size=5,
    ),
    "cnn_three": CNNPreset(
        name="cnn_three", resolution=192,
        encoder=((64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4)),
        epochs=500, batch_size=5,
    ),
    "cnn_four": CNNPreset(
        name="cnn_four", resolution=192,
        encoder=((64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4)),
        scaling="minmax", scale_range=(0.0, 1.0),
        epochs=500, batch_size=20,
    ),
    "cnn_five": CNNPreset(
        name="cnn_five", resolution=192,
        encoder=((64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4)),
        scaling="minmax", scale_range=(0.2, 0.7),
        epochs=500, batch_size=20,
    ),
    "cnn_six": CNNPreset(
        name="cnn_six", resolution=192,
        encoder=((64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4)),
        scaling="minmax_all", scale_range=(0.2, 0.7),
        epochs=200, batch_size=20,
    ),
    "cnn_seven": CNNPreset(
        name="cnn_seven", resolution=384,
        encoder=((16, 2, 2), (64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4), (16, 2, 2)),
        scaling="minmax_all", scale_range=(0.2, 0.7),
        epochs=200, batch_size=20,
    ),
    "cnn_eight": CNNPreset(
        name="cnn_eight", resolution=384,
        encoder=((16, 2, 2), (64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4), (16, 2, 2)),
        aux_bc_at_head=True,
        scaling="minmax_all", scale_range=(0.2, 0.7),
        epochs=600, batch_size=20,
    ),
    "cnn_nine": CNNPreset(
        name="cnn_nine", resolution=384,
        encoder=((16, 2, 2), (64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4), (16, 2, 2)),
        multiscale_front=(2, 4, 8, 12),
        aux_bc_at_input=True, aux_bc_at_head=True,
        scaling="minmax_all", scale_range=(0.2, 0.7),
        epochs=350, batch_size=20,
    ),
    "cnn_ten": CNNPreset(
        name="cnn_ten", resolution=384,
        encoder=((16, 2, 2), (64, 4, 4), (128, 4, 4), (256, 3, 3), (512, 2, 2)),
        decoder=((256, 2, 2), (128, 3, 3), (64, 4, 4), (32, 4, 4), (16, 2, 2)),
        twin_decoders=False,
        multiscale_front=(2, 4, 8, 12),
        aux_bc_at_input=True, aux_bc_at_head=True,
        activation="leaky_relu", optimizer="adam",
        scaling="minmax_all", scale_range=(0.2, 0.7),
        epochs=400, batch_size=20,
    ),
}


class CavityCNN(nn.Module):
    """Encoder-decoder surrogate: (feq planes + Re plane [+ BC planes]) ->
    one steady-state velocity-component field.

    Inputs NHWC: ``x (B, H, W, C_in)`` and optionally ``aux (B, H, W, 2)``
    (lid-row velocity planes, reference ``CNNEight_384/CNN_Eight.py:23-25``).
    """

    preset: CNNPreset
    compute_dtype: jnp.dtype = jnp.float32
    # Weight initialization family.  'lecun_normal' is the flax default the
    # r2-r4 trainings used; 'glorot_uniform' reproduces the Keras 2.x
    # default for Conv2D/Conv2DTranspose (bias is zeros in both stacks), the
    # one framework-level variable the r4 "faithful recipe" runs never
    # controlled (VERDICT r4 missing #1).
    kernel_init: str = "lecun_normal"

    def _kinit(self):
        if self.kernel_init == "lecun_normal":
            return nn.initializers.lecun_normal()
        if self.kernel_init == "glorot_uniform":
            return nn.initializers.glorot_uniform()
        raise ValueError(f"unknown kernel_init {self.kernel_init!r}")

    def _act(self, x):
        if self.preset.activation == "leaky_relu":
            return nn.leaky_relu(x, negative_slope=0.1)
        return nn.relu(x)

    def _decoder(self, z, name):
        p = self.preset
        for i, (feat, k, s) in enumerate(p.decoder):
            z = nn.ConvTranspose(
                feat, (k, k), strides=(s, s), padding="SAME",
                dtype=self.compute_dtype, name=f"{name}_deconv{i}",
                kernel_init=self._kinit(),
            )(z)
            z = self._act(z)
        return z

    @nn.compact
    def __call__(self, x, aux=None):
        p = self.preset
        x = x.astype(self.compute_dtype)
        if aux is not None:
            aux = aux.astype(self.compute_dtype)
        if p.aux_bc_at_input and aux is not None:
            x = jnp.concatenate([x, aux], axis=-1)
        x_in = x

        # Multi-scale front end (CNN_Nine: parallel same-pad convs, concat).
        if p.multiscale_front:
            branches = [
                self._act(nn.Conv(8, (k, k), padding="SAME",
                                  dtype=self.compute_dtype,
                                  kernel_init=self._kinit(),
                                  name=f"ms{k}")(x))
                for k in p.multiscale_front
            ]
            x = jnp.concatenate(branches, axis=-1)

        # Strided encoder.
        for i, (feat, k, s) in enumerate(p.encoder):
            x = nn.Conv(feat, (k, k), strides=(s, s), padding="SAME",
                        dtype=self.compute_dtype, kernel_init=self._kinit(),
                        name=f"enc{i}")(x)
            x = self._act(x)

        # Decoder(s): twin branches concatenated (CNN_One..Nine) or single
        # (CNN_Ten builds only the chosen component's branch).
        if p.twin_decoders:
            da = self._decoder(x, "dec_a")
            db = self._decoder(x, "dec_b")
            y = jnp.concatenate([da, db], axis=-1)
        else:
            y = self._decoder(x, "dec")

        # Skip-concat of the raw input before the 1x1 head (all variants).
        feats = [y, x_in]
        if p.aux_bc_at_head and aux is not None:
            feats.append(aux)
        y = jnp.concatenate(feats, axis=-1)
        y = self._act(nn.Conv(16, (1, 1), dtype=self.compute_dtype,
                              kernel_init=self._kinit(), name="head0")(y))
        y = nn.Conv(1, (1, 1), dtype=jnp.float32,
                    kernel_init=self._kinit(), name="head1")(y)
        return y


def make_model(preset_name: str, compute_dtype=jnp.float32,
               kernel_init: str = "lecun_normal") -> CavityCNN:
    if preset_name not in PRESETS:
        raise KeyError(f"unknown preset {preset_name!r}; have {list(PRESETS)}")
    return CavityCNN(preset=PRESETS[preset_name], compute_dtype=compute_dtype,
                     kernel_init=kernel_init)


def input_channels(preset: CNNPreset) -> int:
    """9 feq planes + 1 Re plane (+2 aux planes when joined at the input)."""
    return 10 + (2 if preset.aux_bc_at_input else 0)


def stride_product(preset: CNNPreset) -> int:
    """Total encoder downsampling factor; input H/W must be divisible by it
    for the decoder to reconstruct the grid (same constraint the reference
    architectures have at their 192/384 native resolutions)."""
    p = 1
    for _, _, s in preset.encoder:
        p *= s
    return p


def check_grid(preset: CNNPreset, h: int, w: int) -> None:
    sp = stride_product(preset)
    if h % sp or w % sp:
        raise ValueError(
            f"{preset.name} downsamples by {sp}; grid {h}x{w} must be a "
            f"multiple of it (native resolution {preset.resolution})"
        )
