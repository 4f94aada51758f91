"""L2-L4: masking, denoiser network, and the diffusion process."""

from .diffusion import DiffusionSchedule, get_betas
from .denoiser import Denoiser, FoldingBlock
from .prdiff import ProteinReDiffModel
