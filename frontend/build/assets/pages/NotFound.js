// NotFound - mirror of pages/NotFound.tsx.

import { h, navigate } from "/assets/ui.js";

export function NotFound(main) {
  main.append(
    h(
      "div",
      { class: "paper center", style: "padding:40px" },
      h("h1", { style: "font-size:56px;margin:0" }, "404"),
      h("h2", {}, "Page Not Found"),
      h("p", { class: "muted" }, "Sorry, we couldn't find the page you're looking for."),
      h("button", { class: "btn-contained", onclick: () => navigate("/") }, "⌂ Back to Dashboard"),
    ),
  );
}
