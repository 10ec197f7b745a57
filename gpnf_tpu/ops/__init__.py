from .actnorm import ActNorm
from .attention import InvertibleAttention
from .basic import GaussianDiag, Squeeze, TupleFlip, split_channels, squeeze2d, unsqueeze2d
from .coupling import AffineCoupling, NNNet, Split2dGaussian
from .conv import Conv2d, Conv2dZeros, WNConv2d, WNDense, conv2d
from .convrnn import (Conv1dLSTM, Conv2dGRU, Conv2dLSTM, Conv2dPeepholeLSTM,
                      Conv2dRNN, Conv3dLSTM, ConvRNN)
from .invconv import InvConv1x1
from .mixlogcdf import MixLogCDFCoupling

__all__ = [
    "ActNorm", "InvertibleAttention", "GaussianDiag", "Squeeze", "TupleFlip",
    "split_channels", "squeeze2d", "unsqueeze2d", "AffineCoupling", "NNNet",
    "Split2dGaussian", "Conv2d", "Conv2dZeros", "WNConv2d", "WNDense", "conv2d",
    "ConvRNN", "Conv1dLSTM", "Conv2dLSTM", "Conv2dGRU", "Conv2dRNN",
    "Conv2dPeepholeLSTM", "Conv3dLSTM", "InvConv1x1", "MixLogCDFCoupling",
]
