"""Encoder registry: name -> (module factory, EncoderConfig)."""

from empanada_tpu.models.encoders.resnet import (
    ResNet,
    resnet18,
    resnet34,
    resnet50,
    resnet101,
    resnet152,
    resnext50_32x4d,
    resnext101_32x8d,
    wide_resnet50_2,
    wide_resnet101_2,
)
from empanada_tpu.models.encoders.regnet import (
    RegNet,
    regnetx_6p4gf,
    regnety_200mf,
    regnety_800mf,
    regnety_3p2gf,
    regnety_4gf,
    regnety_6p4gf,
    regnety_8gf,
    regnety_16gf,
)

ENCODERS = {
    name: obj
    for name, obj in list(globals().items())
    if callable(obj) and not name.startswith("_")
    and name not in ("ResNet", "RegNet")
}


def get_encoder(name: str, **kwargs):
    if name not in ENCODERS:
        raise ValueError(f"unknown encoder {name!r}; choices: {sorted(ENCODERS)}")
    return ENCODERS[name](**kwargs)
