from .losses import l1, l2, LpipsMseLoss
from .lpips import LPIPS
