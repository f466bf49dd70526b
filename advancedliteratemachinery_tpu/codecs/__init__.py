from advancedliteratemachinery_tpu.codecs.char_codec import CharCodec, DEFAULT_CHARSET
from advancedliteratemachinery_tpu.codecs.subword import BpeCodec, WordpieceCodec

__all__ = ["CharCodec", "DEFAULT_CHARSET", "BpeCodec", "WordpieceCodec"]
