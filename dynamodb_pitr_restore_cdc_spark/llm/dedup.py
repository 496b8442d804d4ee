"""(stub — filled in Phase 5)"""
