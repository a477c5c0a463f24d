# namespace package for engine column-function helpers
