"""(stub — filled in Phase 4)"""
