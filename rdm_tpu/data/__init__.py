from .datasets import (get_dataset, load_arrays, index_iterator,  # noqa: F401
                       GTOHaloImageDataset, GTOHaloTrajectoryDataset,
                       GTO_MEAN, GTO_STD, make_synthetic_gto_pkl)
