"""(stub — filled in Phase 3)"""
