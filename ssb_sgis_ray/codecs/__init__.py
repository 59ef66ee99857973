"""Pure-python image codecs + perceptual hashing (no PIL in this env)."""
