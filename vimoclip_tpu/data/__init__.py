from vimoclip_tpu.data.hdf5_schema import (  # noqa: F401
    EmbeddingWriter,
    analyze_structure,
    compare_structures,
    list_video_keys,
    read_embeddings,
    read_labels,
)
from vimoclip_tpu.data.embedding_dataset import (  # noqa: F401
    PairedEmbeddingDataset,
    collate_pad,
    sparse_sample_indices,
)
from vimoclip_tpu.data.segment_dataset import SegmentDataset  # noqa: F401
from vimoclip_tpu.data.pipeline import BatchLoader, prefetch_to_device  # noqa: F401
