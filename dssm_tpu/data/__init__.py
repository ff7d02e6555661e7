from dssm_tpu.data import trigram  # noqa: F401
from dssm_tpu.data.loader import (  # noqa: F401
    Batch,
    HashedPairs,
    batch_iterator,
    eval_batches,
    hash_pairs,
    prefetch,
    select_batch,
)
from dssm_tpu.data.corpus import (  # noqa: F401
    Pairs,
    hash_pairs_chunked,
    iter_pairs,
    load_file_corpus,
    read_pairs,
    write_tsv,
)
from dssm_tpu.data.toy import ToyPairs, make_toy_pairs, train_eval_split  # noqa: F401
