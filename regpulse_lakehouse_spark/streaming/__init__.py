from .ledger import RunLedger, stream_scan

__all__ = ["RunLedger", "stream_scan"]
