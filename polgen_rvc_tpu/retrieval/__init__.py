from .topk import retrieval_blend, load_index_bank
