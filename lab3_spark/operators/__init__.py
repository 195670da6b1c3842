from lab3_spark.operators.inverted_index import inverted_index
from lab3_spark.operators.topk import top_k_words
from lab3_spark.operators.wordcount import word_count, word_counts_unfiltered

__all__ = [
    "word_count",
    "word_counts_unfiltered",
    "top_k_words",
    "inverted_index",
]
