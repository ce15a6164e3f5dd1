from .flows import MaskedAutoregressiveFlow
from .embedding import LightCurveEmbedding
from .inference import LFIPosterior, train_flow_posterior
from .pretrained import (PretrainedSimilarityEmbedding,
                         similarity_embedding_apply)
from .vicreg import (SimilarityEmbedder, augment_lightcurves,
                     pretrain_similarity_embedding, vicreg_loss)

__all__ = ["MaskedAutoregressiveFlow", "LightCurveEmbedding",
           "LFIPosterior", "train_flow_posterior",
           "PretrainedSimilarityEmbedding", "similarity_embedding_apply",
           "SimilarityEmbedder", "augment_lightcurves",
           "pretrain_similarity_embedding", "vicreg_loss"]
