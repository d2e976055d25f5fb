from .pipeline import (AMDReconstructionPipeline, AMDCrossVideoPipeline,
                       AMDDiffMotionPipeline, GTMotionAblationPipeline,
                       ImageAudio2VideoPipeline)
