from empanada_tpu.models.decoders.aspp import ASPP
from empanada_tpu.models.decoders.panoptic_deeplab import PanopticDeepLabDecoder
from empanada_tpu.models.decoders.bifpn import BiFPN, BiFPNDecoder
