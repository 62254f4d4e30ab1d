from .codebook import Codebook
from .kmeans import kmeans
