"""Neural renderer model family (pose2frame GAN), TPU-first flax modules.

Capability parity with the reference's external vid2vid fork
(SURVEY.md §2.3): composite flow-warped generator, multiscale / temporal /
face discriminators, and the vid2vid loss family.
"""

from text2video_tpu.models.discriminator import (
    MultiscaleDiscriminator,
    PatchDiscriminator,
    face_crop,
)
from text2video_tpu.models.generator import CompositeGenerator
from text2video_tpu.models.vgg import VGG19Features

__all__ = [
    "CompositeGenerator",
    "MultiscaleDiscriminator",
    "PatchDiscriminator",
    "VGG19Features",
    "face_crop",
]
