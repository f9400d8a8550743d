from .decoder import VideoDecoder, decoder_available

__all__ = ["VideoDecoder", "decoder_available"]
