class SymbolDatabase:
    def RegisterMessage(self, message):
        return message

    def RegisterFileDescriptor(self, fd):
        return fd


_DEFAULT = SymbolDatabase()


def Default() -> SymbolDatabase:
    return _DEFAULT
