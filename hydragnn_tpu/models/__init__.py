from hydragnn_tpu.models.create import create_model, create_model_config

__all__ = ["create_model", "create_model_config"]
