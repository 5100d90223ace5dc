from .model_preparation import JaxModel, construct_model

__all__ = ["JaxModel", "construct_model"]
