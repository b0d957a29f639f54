from fdblucene_ray.analysis.analyzer import (  # noqa: F401
    ANALYZERS,
    Analyzer,
    get_analyzer,
)
from fdblucene_ray.analysis.porter import porter_stem  # noqa: F401
from fdblucene_ray.analysis.stopwords import ENGLISH_STOPWORDS  # noqa: F401
