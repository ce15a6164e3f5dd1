from .flows import MaskedAutoregressiveFlow
from .embedding import LightCurveEmbedding
from .inference import LFIPosterior, train_flow_posterior

__all__ = ["MaskedAutoregressiveFlow", "LightCurveEmbedding",
           "LFIPosterior", "train_flow_posterior"]
