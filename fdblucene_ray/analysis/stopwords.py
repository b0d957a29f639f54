"""English stopword set.

The reference indexes ``TextField`` through Lucene's default analyzer
(SimpleFDBDirectoryTest.java:209-214 uses ``new IndexWriterConfig()`` =
StandardAnalyzer); this is Lucene's classic 33-word English stop set
(public, from the original Lucene StopAnalyzer.ENGLISH_STOP_WORDS_SET).
"""

ENGLISH_STOPWORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)
