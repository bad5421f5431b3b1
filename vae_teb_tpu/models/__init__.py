"""Model families: SeqVaeTeb + variants, InceptionTime classifier."""

from .blocks import (LSTM, CausalConv1d, CausalConvBlock, ReflectConvBlock,
                     ResidualMLP, geometric_schedule, linear_upsample)
from .inception_time import (InceptionTimeClassifier, SeqVaeTebClassifier,
                             cross_entropy_loss)
from .vae_teb import (ConditionalEncoder, Decoder, SeqVaeTeb, SourceEncoder,
                      TargetEncoder, decoder_loss, gaussian_kld, gaussian_nll,
                      source_stream_init_state, stitch_predictions)
from .variants import (ConvWindowDecoder, DirectWindowDecoder,
                       PredictStDecoder, SeqVaeTebForecast, SeqVaeTebPredictSt,
                       future_window_targets, ldam_loss, predict_st_loss,
                       sliding_window_nll)

__all__ = [
    "LSTM", "CausalConv1d", "CausalConvBlock", "ReflectConvBlock",
    "ResidualMLP", "geometric_schedule", "linear_upsample",
    "InceptionTimeClassifier", "SeqVaeTebClassifier", "cross_entropy_loss",
    "ConditionalEncoder", "Decoder", "SeqVaeTeb", "SourceEncoder",
    "TargetEncoder", "decoder_loss", "gaussian_kld", "gaussian_nll",
    "source_stream_init_state", "stitch_predictions",
    "ConvWindowDecoder", "DirectWindowDecoder", "PredictStDecoder",
    "SeqVaeTebForecast", "SeqVaeTebPredictSt", "future_window_targets",
    "ldam_loss", "predict_st_loss", "sliding_window_nll",
]
