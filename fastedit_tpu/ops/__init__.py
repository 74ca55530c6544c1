from fastedit_tpu.ops.attention import attention  # noqa: F401
from fastedit_tpu.ops.conv import conv3x3_same  # noqa: F401
from fastedit_tpu.ops.groupnorm import group_norm  # noqa: F401
from fastedit_tpu.ops import flags  # noqa: F401
