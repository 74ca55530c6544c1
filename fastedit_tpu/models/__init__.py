from fastedit_tpu.models import configs  # noqa: F401
from fastedit_tpu.models.clip import CLIPTextModel  # noqa: F401
from fastedit_tpu.models.controlnet import ControlNetModel  # noqa: F401
from fastedit_tpu.models.unet import UNet2DConditionModel  # noqa: F401
from fastedit_tpu.models.vae import AutoencoderKL  # noqa: F401
