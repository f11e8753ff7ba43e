"""Framework-wide constants and enums.

Parity reference: gymnax_exchange/jaxob/jaxob_constants.py (reference repo).
All integer values match the reference so that message streams, book arrays
and trade buffers are bit-compatible.
"""
from enum import IntEnum

MAX_INT32 = 2_147_483_647

# Sentinel ids (reference: jaxob_constants.py:9-12)
INIT_ID = -2
NEGATIVE_RETURN_ID = -99
DUMMY_ID = -888888
EMPTY_SLOT = -1

# Array widths (reference: jaxob_constants.py:15-17)
ORDER_FEATS = 6
TRADE_FEATS = 8
NS_PER_SEC = 1_000_000_000

# Default capacities (reference: jaxob_constants.py:21-25)
NTRADE_CAP = 100
NORDER_CAP = 100
START_OF_DAY = (34200, 0)
END_OF_DAY = (57600, 0)

SEED = 42


class MsgType(IntEnum):
    """LOBSTER message types (reference: jaxob_constants.py:29-36)."""
    LIMIT = 1
    CANCEL = 2
    DELETE = 3
    MATCH = 4
    HIDDEN = 5
    AUCTION = 6
    HALT = 7


class Side(IntEnum):
    """Order side encoding (reference: jaxob_constants.py:58-61)."""
    BID = 1
    ASK = -1


class OrderCol(IntEnum):
    """Columns of a book-side row (reference: jaxob_constants.py:38-44)."""
    PRICE = 0
    QUANT = 1
    OID = 2
    TID = 3
    TIME_S = 4
    TIME_NS = 5


class TradeCol(IntEnum):
    """Columns of a trade row (reference: jaxob_constants.py:46-54)."""
    PRICE = 0
    QUANT = 1       # sign encodes aggressor side: q<0 => incoming buy
    PASS_OID = 2
    AGR_OID = 3
    TIME_S = 4
    TIME_NS = 5
    PASS_TID = 6
    AGR_TID = 7


class MsgCol(IntEnum):
    """Columns of a message row (reference: jaxob_constants.py:84-92)."""
    TYPE = 0
    SIDE = 1
    QUANT = 2
    PRICE = 3
    OID = 4
    TID = 5
    TIME_S = 6
    TIME_NS = 7


class CancelMode(IntEnum):
    """Fallback behaviour for cancels whose order-id is not in the book
    (reference: jaxob_constants.py:64-68)."""
    STRICT_BY_ID = 0
    INCLUDE_INITS = 1
    CANCEL_UNIFORM = 2
    CANCEL_UNIFORM_AND_LARGE = 3


class Type4(IntEnum):
    """Interpretation of type-4 (execution) messages
    (reference: jaxob_constants.py:70-74)."""
    IOC = 0   # match only; unmatched remainder NOT added to book
    LIM = 1   # remainder IS added to the book
    MKT = 2   # extreme price, remainder NOT added


class SimulatorMode(IntEnum):
    GENERAL_EXCHANGE = 0
    LOBSTER_INTERPRETER = 1  # reference stub, not implemented there either
