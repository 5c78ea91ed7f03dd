from .corpus import CorpusSpec, generate_corpus, corpus_path, seeds_for

__all__ = ["CorpusSpec", "generate_corpus", "corpus_path", "seeds_for"]
