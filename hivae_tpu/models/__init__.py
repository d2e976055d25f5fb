"""Model zoo registry."""

from . import amd, a2m, base, blocks, conv_blocks, dit, mae, model_ae, \
    motion_encoders, t2m, vae
from .amd import AMD_MODELS, AMDConfig, AMDModel, AMDModelNew, AMDModelRec
from .mae import MAE_MODELS
