from .flows import MaskedAutoregressiveFlow
from .embedding import LightCurveEmbedding
from .inference import LFIPosterior, train_flow_posterior
from .pretrained import (PretrainedSimilarityEmbedding,
                         similarity_embedding_apply)

__all__ = ["MaskedAutoregressiveFlow", "LightCurveEmbedding",
           "LFIPosterior", "train_flow_posterior",
           "PretrainedSimilarityEmbedding", "similarity_embedding_apply"]
