from .flatten import (
    FlattenActionSpaceWrapper,
    FlattenObservationWrapper,
    FlattenRGBDObservationWrapper,
)
from .gymnasium import CPUGymWrapper
from .frame_stack import FrameStack
from .action_repeat import ActionRepeatWrapper
from .record import RecordEpisode
from .cached_reset import CachedResetWrapper
from .visual_encoders import VisualEncoderWrapper
