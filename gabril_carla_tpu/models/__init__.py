from .encoder import Encoder, Decoder, AutoEncoder, ResidualStack
from .vq import VectorQuantizer
from .heads import PreActor, Actor, Projector, mlp_head
from .unet import UNet

__all__ = [
    "Encoder",
    "Decoder",
    "AutoEncoder",
    "ResidualStack",
    "VectorQuantizer",
    "PreActor",
    "Actor",
    "Projector",
    "mlp_head",
    "UNet",
]
