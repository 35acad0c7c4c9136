from .common import quantize_rgba8, reinhard_gamma, split_hdr
from .filters import final_filter, first_filter, second_filter
from .fxaa import fxaa
from .taa import FRAMES, Jitter, TAAState, taa_apply
from .temporal import TemporalState, push_frame, temporal_average

__all__ = [
    "FRAMES", "Jitter", "TAAState", "TemporalState", "final_filter",
    "first_filter", "fxaa", "push_frame", "quantize_rgba8", "reinhard_gamma",
    "second_filter", "split_hdr", "taa_apply", "temporal_average",
]
