"""Signal-chain models: complete, config-driven DSP pipelines built from
the ops layer (the framework's 'model families')."""

from .fm_receiver import FmReceiver, FmReceiverConfig, wbfm_demod

__all__ = ["FmReceiver", "FmReceiverConfig", "wbfm_demod"]
