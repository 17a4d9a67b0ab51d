from radian_tpu.lm.kmer import (  # noqa: F401
    KmerLM,
    load_kmer_json,
    build_dense_tables,
    pack_context,
    random_kmer_model,
)
