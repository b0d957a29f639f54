from fdblucene_ray.sources.corpus import read_corpus_with_doc_ids  # noqa: F401
from fdblucene_ray.sources.webpages import (  # noqa: F401
    extract_text,
    extract_text_batch,
    generate_webpages,
    synth_webpages_parquet,
)
