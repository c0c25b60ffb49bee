from . import decode, engine
