from .autoencoder import SimpleQuantizeAutoEncoder, ConvEncoder, ConvDecoder
from .transformer import MiniEncoder
from .data import image_batches
