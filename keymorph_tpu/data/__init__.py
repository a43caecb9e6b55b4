from keymorph_tpu.data.nifti import NiftiImage, load_nifti, save_nifti  # noqa: F401
from keymorph_tpu.data.preprocess import Preprocessor  # noqa: F401
from keymorph_tpu.data.datasets import (  # noqa: F401
    CSVDataset,
    IXIDataset,
    PairedDataset,
    SimpleDatasetIterator,
)
from keymorph_tpu.data.loader import ThreadPrefetcher, device_prefetch  # noqa: F401
