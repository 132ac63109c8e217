from .attention import attend, attend_xla, decode_attend

__all__ = ["attend", "attend_xla", "decode_attend"]
