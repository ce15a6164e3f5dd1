from .app import AnalysisService, run_nmma_model

__all__ = ["AnalysisService", "run_nmma_model"]
