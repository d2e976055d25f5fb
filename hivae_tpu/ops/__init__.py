from . import rectified_flow
from . import frequency
from . import wavelet
from . import regularizers
from . import embeddings
