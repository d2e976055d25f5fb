from .pipeline import (AMDReconstructionPipeline, AMDCrossVideoPipeline,
                       ImageAudio2VideoPipeline)
