from .model import UNet2DConditionModel, UNetConfig
