from .pipeline import (AMDReconstructionPipeline, AMDCrossVideoPipeline,
                       GTMotionAblationPipeline, ImageAudio2VideoPipeline)
