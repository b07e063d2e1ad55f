from .linear import Linear, ColumnLinear, RowLinear
from .normalization import LayerNorm, RmsNorm, GroupNorm
from .conv import Conv1d, Conv2d, ConvTranspose2d
from .embedding import Embedding, PromptTuningEmbedding
from .activation import Gelu, Mish, Cast, AvgPool2d
from .mlp import MLP, GatedMLP
from .attention import Attention, AttentionMaskType, PositionEmbeddingType
