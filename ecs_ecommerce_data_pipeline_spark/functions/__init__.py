from .numeric import money_avg, money_sum, rate
from .textfn import md5_bigint, tokens, word_shingles

__all__ = ["money_avg", "money_sum", "rate", "md5_bigint", "tokens", "word_shingles"]
