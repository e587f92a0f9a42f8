"""Model zoo: frozen experts, the trainable fusion head, and all variants.

Experts (frozen at train time):
- `nafnet.NAFNetSR` — NAFNet-64 with bicubic ×4 pre-upsample
- `dat.DAT` — Dual Aggregation Transformer
- `hat.HAT` — Hybrid Attention Transformer (HAT-L)
- `mambair.MambaIR` — state-space SR via associative scan (vestigial in the
  reference, CUDA-free here)

Fusion:
- `fusion.FusionHead` — the production CompleteEnhancedFusionSR equivalent
- `fusion_v2.FusionHeadV2` — the compact alternate variant
- `fusion_variants` — FrequencyAwareFusion / MultiFusionSR /
  MultiResolutionFusion / EnhancedMultiFusionSR baselines
- `experts.ExpertEnsemble` / `experts.FreqFusionSR` — live composition
- `tsdsr` — optional DiT diffusion refinement + CompleteSRPipeline
"""

from .dat import DAT  # noqa: F401
from .experts import ExpertEnsemble, FreqFusionSR  # noqa: F401
from .fusion import FusionConfig, FusionHead  # noqa: F401
from .hat import HAT  # noqa: F401
from .nafnet import NAFNetSR  # noqa: F401
