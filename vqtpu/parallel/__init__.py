from . import collectives
from .collectives import psum, pmean, all_gather, axis_size
