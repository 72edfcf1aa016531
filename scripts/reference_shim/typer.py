"""Minimal typer stand-in so the reference code imports in this image
(typer is not installed). Only the API surface the reference uses:
Typer()/command decorator, Option/Argument (return their default), echo, Exit.
"""


class Exit(SystemExit):
    def __init__(self, code=0):
        super().__init__(code)


def Option(default=None, *args, **kwargs):
    return default


def Argument(default=None, *args, **kwargs):
    return default


def echo(message="", *args, **kwargs):
    print(message)


class Typer:
    def __init__(self, *args, **kwargs):
        self._commands = {}

    def command(self, *args, **kwargs):
        def deco(fn):
            self._commands[fn.__name__] = fn
            return fn

        return deco

    def __call__(self, *args, **kwargs):
        raise NotImplementedError("shim: call commands directly")
